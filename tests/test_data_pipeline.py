"""The Python data pipeline's liveness contract + the loader A/B tool.

infinite_loader (gan_control_tpu/data/datasets.py) prefetches on a
background thread; these pin the two failure modes that would otherwise
hang or crash at a distance: a decode error must surface at
``next(loader)`` (not kill the producer thread silently, leaving the
train loop blocked on an empty queue forever), and ``close()`` must stop
the workers even when the producer is blocked mid-``q.put`` (so e.g. a
TemporaryDirectory holding the corpus can be removed safely —
tools/loader_bench.py relies on this)."""

from __future__ import annotations

import json
import os
import subprocess
import sys
import threading
import time
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from gan_control_tpu.data.datasets import infinite_loader


class _ToyDataset:
    """In-memory stand-in with an injectable per-index failure."""

    def __init__(self, n=16, fail_at=None):
        self.n = n
        self.fail_at = fail_at

    def __len__(self):
        return self.n

    def load(self, idx, rng):
        if self.fail_at is not None and int(idx) == self.fail_at:
            raise FileNotFoundError(f"image {idx} vanished")
        return np.full((8, 8, 3), float(idx), np.float32)


def test_decode_error_surfaces_at_next():
    loader = infinite_loader(_ToyDataset(n=8, fail_at=3), batch_size=8,
                             workers=2, seed=0)
    # batch = the whole dataset, so index 3 is in the first batch
    with pytest.raises(FileNotFoundError, match="vanished"):
        next(loader)
    loader.close()


def test_close_unblocks_a_full_prefetch_queue():
    ds = _ToyDataset(n=16)
    loader = infinite_loader(ds, batch_size=4, workers=2, seed=0)
    b = next(loader)
    assert b.shape == (4, 8, 8, 3)
    # let the producer fill the prefetch queue and block in q.put
    time.sleep(0.3)
    n_before = threading.active_count()
    loader.close()
    deadline = time.time() + 5
    while threading.active_count() >= n_before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() < n_before, "producer did not exit"


def test_loader_bench_tool_smoke(tmp_path):
    env = dict(os.environ)
    repo = Path(__file__).resolve().parents[1]
    proc = subprocess.run(
        [sys.executable, str(repo / "tools" / "loader_bench.py"),
         "--images", "32", "--src", "96", "--size", "64",
         "--batch", "8", "--batches", "3", "--workers", "2"],
        env=env, capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, (proc.stdout[-500:], proc.stderr[-2000:])
    lines = [json.loads(l) for l in proc.stdout.splitlines() if l.strip()]
    by_backend = {r["backend"]: r for r in lines if "imgs_per_s" in r}
    # the python fallback always measures; the native leg too when built
    assert "python_pil" in by_backend
    for rec in by_backend.values():
        assert rec["imgs_per_s"] > 0 and rec["train_cadence_headroom"] > 0
    assert "Exception in thread" not in proc.stderr
