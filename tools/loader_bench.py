"""Data-pipeline throughput A/B: native C++ loader vs the Python/PIL path.

Usage:  python tools/loader_bench.py [--images 256] [--src 640] [--size 512]
                                     [--batch 16] [--batches 20] [--workers 4]

The native backend (native/gcdata.cpp: C++ thread pool doing JPEG decode +
augment + batch assembly, the replacement for the reference's 32-worker
torch DataLoader, ffhq_dataset.py) exists to keep the input pipeline off
the training critical path. This tool grounds that with numbers on the
current box: it synthesizes a JPEG corpus, then measures steady-state
imgs/s through BOTH backends via the real `get_data_loader` dispatch, and
reports each against the measured train cadence (TRAINING.md: 33.3
imgs/s/chip at 512² — the bar a loader must clear per chip it feeds).

One JSON line per backend. Same-box A/B only; absolute numbers scale with
host cores (this dev box has 1).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

TRAIN_IMGS_PER_S = 33.3  # TRAINING.md cadence-amortized 512² train rate


def make_corpus(root: Path, n: int, src: int, seed: int = 0) -> None:
    from PIL import Image

    rng = np.random.default_rng(seed)
    for i in range(n):
        # low-frequency content so the JPEGs are realistically sized
        # (pure noise compresses pathologically slowly)
        small = rng.integers(0, 256, (src // 16, src // 16, 3), np.uint8)
        img = Image.fromarray(small).resize((src, src), Image.BILINEAR)
        img.save(root / f"{i:05d}.jpg", quality=92)


def measure(loader, batch: int, n_batches: int, warmup: int = 3) -> dict:
    for _ in range(warmup):
        b = next(loader)
        assert b.shape[0] == batch and np.isfinite(b).all()
    t0 = time.perf_counter()
    for _ in range(n_batches):
        b = next(loader)
    dt = time.perf_counter() - t0
    rate = batch * n_batches / dt
    return {"imgs_per_s": round(rate, 1),
            "ms_per_batch": round(dt / n_batches * 1e3, 1),
            "train_cadence_headroom": round(rate / TRAIN_IMGS_PER_S, 2)}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=256)
    ap.add_argument("--src", type=int, default=640)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--batches", type=int, default=20)
    ap.add_argument("--workers", type=int, default=4)
    args = ap.parse_args(argv)

    from gan_control_tpu.data import native_loader as nl
    from gan_control_tpu.data.datasets import get_data_loader

    with tempfile.TemporaryDirectory(prefix="loader_bench_") as td:
        root = Path(td)
        make_corpus(root, args.images, args.src)

        backends = [("python_pil", False)]
        if nl.available():
            backends.insert(0, ("native_cpp", True))
        else:
            print(json.dumps({"backend": "native_cpp",
                              "skipped": "libgcdata.so not built"}))

        for name, native in backends:
            loader = get_data_loader(
                {"data_set_name": "ffhq", "path": str(root),
                 "native": native, "workers": args.workers},
                args.batch, args.size,
            )
            try:
                stats = measure(loader, args.batch, args.batches)
            finally:
                # stop the backend's prefetch workers before the corpus
                # tempdir vanishes
                loader.close()
            print(json.dumps({
                "backend": name, "decode_src_px": args.src,
                "out_px": args.size, "batch": args.batch,
                "workers": args.workers,
                **stats,
            }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
