"""One-off probe: the predictor battery's share of g_step wall-clock.

Usage:  python tools/battery_share.py

Builds the bench harness twice — full 6-predictor contrastive battery vs
adversarial-only (attr=False) — and measures both g_step executables
back-to-back in the SAME process (donated state, single scalar-fetch sync;
the same protocol as tools/train_mfu.py). The difference is the battery's
end-to-end cost (forward + backward through the frozen nets), the number
that decides whether a bf16-storage battery is worth building.
"""

from __future__ import annotations

import os
import sys
import time

os.environ.setdefault("GANCTL_LOG_STDERR", "1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def measure_g(h):
    import jax

    steps, state, pred_params = h["steps"], h["state"], h["pred_params"]
    zs = h["zs"]
    compiled = (
        jax.jit(steps["g_step"], donate_argnums=(0,))
        .lower(state, (zs[1],), pred_params)
        .compile()
    )
    cost = compiled.cost_analysis()
    cost = cost[0] if isinstance(cost, (list, tuple)) else cost
    state, m = compiled(state, (zs[1],), pred_params)
    float(np.asarray(next(iter(m.values()))))  # warmup sync
    reps = 8
    t0 = time.perf_counter()
    for _ in range(reps):
        state, m = compiled(state, (zs[1],), pred_params)
    float(np.asarray(next(iter(m.values()))))
    dt = (time.perf_counter() - t0) / reps
    return dt, float(cost.get("flops", 0.0)), float(cost.get("bytes accessed", 0.0))


def main():
    import jax

    from bench import _setup_jax, build_train_harness

    on_tpu = jax.default_backend() != "cpu"
    _setup_jax(on_tpu)
    legs = [
        ("g_step_battery_f32", True, "float32"),
        ("g_step_battery_bf16", True, "bfloat16"),
        ("g_step_battery_int8", True, "int8"),
        ("g_step_adv_only", False, "float32"),
    ]
    for name, attr, dtype in legs:
        os.environ["BENCH_PRED_DTYPE"] = dtype
        h = build_train_harness(on_tpu=on_tpu, attr=attr)
        dt, flops, hbm = measure_g(h)
        print(
            f"{name:22s} measured={dt * 1e3:7.1f} ms  "
            f"flops={flops / 1e12:6.2f} TF  hbm={hbm / 1e9:7.2f} GB"
        )
        del h


if __name__ == "__main__":
    main()
