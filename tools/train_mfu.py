"""MFU accounting for the phase-1 train step on the real chip.

Usage:  python tools/train_mfu.py [--measure]

For each of the four train executables (d_step, g_step with the full
contrastive battery, d_reg_step, g_reg_step) this prints XLA's own cost
analysis — FLOPs and HBM bytes accessed — plus, with ``--measure``, the
same-process back-to-back mean wall-clock (8 donated runs enqueued
unsynced, one scalar-fetch sync at the end so the tunnel RTT amortizes)
and the implied MFU against the v5e peak (197 TFLOP/s bf16 / 98.5 f32). This separates "the step is slow because
the graph does too many FLOPs" from "the step is slow because the chip is
idle" so optimization work targets the real limiter. Developer tool; not
part of the driver contract (bench.py is).
"""

from __future__ import annotations

import os
import sys
import time

os.environ.setdefault("GANCTL_LOG_STDERR", "1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

V5E_PEAK_BF16 = 197e12
V5E_HBM_GBS = 819e9  # v5e HBM bandwidth, bytes/s


def main():
    import jax

    from bench import _setup_jax, build_train_harness

    measure = "--measure" in sys.argv
    on_tpu = jax.default_backend() != "cpu"
    # persistent compile cache: 4 big executables, minutes each cold over
    # the tunnel — warm runs load from /tmp/jax_tpu_cache instead
    _setup_jax(on_tpu)
    h = build_train_harness(on_tpu=on_tpu)
    steps, state, pred_params = h["steps"], h["state"], h["pred_params"]
    real, zs, cfg, batch = h["real"], h["zs"], h["cfg"], h["batch"]
    path_batch = max(1, batch // cfg.path_batch_shrink)

    # donate the state (like the real trainer's jits): without donation each
    # in-flight timed execution allocates a FULL new output state, and the
    # back-to-back rep loop OOMs the 16GB chip on accumulated state copies
    donate = {"donate_argnums": (0,)}
    lowered = {
        "d_step": jax.jit(steps["d_step"], **donate).lower(state, real, (zs[0],)),
        "g_step": jax.jit(steps["g_step"], **donate).lower(state, (zs[1],), pred_params),
        "d_reg_step": jax.jit(steps["d_reg_step"], **donate).lower(state, real),
        "g_reg_step": jax.jit(steps["g_reg_step"], **donate).lower(
            state, (zs[2][:path_batch],)
        ),
    }
    calls = {
        "d_step": lambda f, s: f(s, real, (zs[0],)),
        "g_step": lambda f, s: f(s, (zs[1],), pred_params),
        "d_reg_step": lambda f, s: f(s, real),
        "g_reg_step": lambda f, s: f(s, (zs[2][:path_batch],)),
    }

    total_amortized = 0.0
    cadence = {"d_step": 1.0, "g_step": 1.0,
               "d_reg_step": 1.0 / cfg.d_reg_every,
               "g_reg_step": 1.0 / cfg.g_reg_every}
    for name, low in lowered.items():
        compiled = low.compile()
        cost = compiled.cost_analysis()
        cost = cost[0] if isinstance(cost, (list, tuple)) else cost
        flops = float(cost.get("flops", 0.0))
        bytes_acc = float(cost.get("bytes accessed", 0.0))
        line = (f"{name:11s} flops={flops/1e12:7.3f} TF  "
                f"hbm={bytes_acc/1e9:7.2f} GB  "
                f"compute-floor={flops/V5E_PEAK_BF16*1e3:6.1f} ms  "
                f"hbm-floor={bytes_acc/V5E_HBM_GBS*1e3:6.1f} ms")
        if measure:
            run = calls[name]

            def force(metrics):
                # block_until_ready is a NO-OP over the axon tunnel: only a
                # scalar FETCH proves the program ran (verify SKILL.md); one
                # fetch drains the whole enqueued stream
                return float(np.asarray(next(iter(metrics.values()))))

            # the state THREADS through every run (donated in, new out) —
            # constant memory exactly like the trainer's pipelined dispatch
            state, m = run(compiled, state)
            force(m)  # warmup (load + first run)
            reps = 8
            t0 = time.perf_counter()
            for _ in range(reps):
                state, m = run(compiled, state)
            force(m)
            # back-to-back mean: the ~0.1 s tunnel RTT of the final sync
            # amortizes over reps instead of inflating every sample
            dt = (time.perf_counter() - t0) / reps
            mfu = flops / V5E_PEAK_BF16 / dt
            hbm_util = bytes_acc / V5E_HBM_GBS / dt
            line += f"  measured={dt*1e3:7.1f} ms  MFU={mfu:5.1%}  HBM={hbm_util:5.1%}"
            total_amortized += dt * cadence[name]
            del m
        print(line)
    if measure:
        print(f"cadence-amortized (sync-bounded upper bound): "
              f"{total_amortized*1e3:.1f} ms/iter "
              f"({batch/total_amortized:.1f} imgs/s)")


if __name__ == "__main__":
    main()
