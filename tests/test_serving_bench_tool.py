"""tools/serving_bench.py — the serving-latency A/B tool contract.

The real numbers come from the TPU run quoted in SERVING.md (1.59x p50 at
batch 1); here the tool's full flow — synthetic flagship-layout build,
both dispatch paths, per-request timing, JSON emission — executes as a
tiny CPU smoke so a refactor of Controller/ServingController cannot
silently break the measurement tool."""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def test_serving_bench_cpu_smoke():
    env = dict(os.environ)
    env.update({
        "JAX_PLATFORMS": "cpu",
        "JAX_COMPILATION_CACHE_DIR": "/tmp/jax_test_cache",
        "JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS": "0",
        "SERVING_BENCH_SIZE": "16",
        "SERVING_BENCH_BATCHES": "1",
        "SERVING_BENCH_REQUESTS": "2",
    })
    proc = subprocess.run(
        [sys.executable, str(REPO / "tools" / "serving_bench.py")],
        env=env, capture_output=True, text=True, timeout=900,
    )
    assert proc.returncode == 0, (proc.stdout[-1000:], proc.stderr[-3000:])
    lines = [json.loads(l) for l in proc.stdout.splitlines() if l.strip()]
    assert len(lines) == 1, proc.stdout
    rec = lines[0]
    assert rec["metric"] == "serving_latency_16px_batch1"
    assert rec["requests"] == 2
    for path in ("multi_dispatch", "fused_one_dispatch"):
        stats = rec[path]
        assert stats["p50_ms"] > 0 and stats["min_ms"] <= stats["p50_ms"]
