"""bf16-mixed vs pure-f32 training-trajectory A/B on the real chip.

TRAINING.md's "Numerics status" notes full-run FID parity of a
bf16-trained model is undemonstrated (no multi-day budget). This tool
measures the slice that IS measurable on this box: run N iterations of
the full phase-1 cadence (D, R1 at d_reg_every, G+contrastive battery,
path-length at g_reg_every — the same four executables bench.py times)
twice from the SAME initial parameters, data and latents — once with
``mixed_precision: true`` (the shipped 512² default: bf16 G/D compute,
f32 params/reductions) and once pure f32 — and report per-metric
trajectory statistics.

GAN training is chaotic, so per-iteration values decorrelate after the
first few steps regardless of numerics; what a healthy bf16 plan must
show is a first-iteration (pre-chaos) relative delta at bf16 rounding
scale, no blowups or NaNs, and distributional agreement where the metric
is stable enough to have a distribution (the D side; the G side's
random-weight contrastive magnitudes are outlier-dominated — see the
committed table's reading). That is what gets printed, one JSON line per
metric plus a verdict line.

Usage:  python tools/numerics_ab.py [--iters 48] [--batch 16]

The measured table lives in TRAINING.md ("Numerics status"); re-run on
new hardware or after touching training/train_step.py numerics.
"""

from __future__ import annotations

import argparse
import gc
import json
import os
import sys

os.environ.setdefault("GANCTL_LOG_STDERR", "1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


METRICS = ("d_loss", "g_loss", "d_r1_loss", "g_path_loss")


def run_trajectory(
    leg_a: bool, iters: int, batch: int, on_tpu: bool,
    ab: str = "mixed_precision",
) -> dict:
    """N cadence iterations from a fixed seed; returns metric trajectories.

    ab="mixed_precision": leg_a toggles BENCH_TRAIN_MP (bf16 G/D vs f32).
    ab="predictor_dtype": G/D stay at the shipped bf16 plan; leg_a toggles
    the battery STORAGE dtype (bfloat16 vs float32) — the evidence behind
    shipping predictor_dtype=bfloat16 (halves battery HBM bytes)."""
    import jax

    from bench import build_train_harness

    if ab == "predictor_dtype":
        os.environ["BENCH_TRAIN_MP"] = "1"
        os.environ["BENCH_PRED_DTYPE"] = "bfloat16" if leg_a else "float32"
    else:
        os.environ["BENCH_TRAIN_MP"] = "1" if leg_a else "0"
        os.environ.pop("BENCH_PRED_DTYPE", None)
    # same memory plan decision as the trainer: f32 512² needs full remat
    os.environ.pop("BENCH_TRAIN_REMAT", None)
    os.environ["BENCH_TRAIN_BATCH"] = str(batch)
    h = build_train_harness(on_tpu)
    cfg = h["cfg"]
    d_step = jax.jit(h["steps"]["d_step"], donate_argnums=(0,))
    g_step = jax.jit(h["steps"]["g_step"], donate_argnums=(0,))
    d_reg_step = jax.jit(h["steps"]["d_reg_step"], donate_argnums=(0,))
    g_reg_step = jax.jit(h["steps"]["g_reg_step"], donate_argnums=(0,))
    state, pred_params, real, zs = h["state"], h["pred_params"], h["real"], h["zs"]
    path_batch = max(1, batch // cfg.path_batch_shrink)

    traj: dict[str, list[float]] = {m: [] for m in METRICS}
    for i in range(iters):
        state, dm = d_step(state, real, (zs[i % 4],))
        traj["d_loss"].append(float(dm["d_loss"]))
        if i % cfg.d_reg_every == 0:
            state, dr = d_reg_step(state, real)
            traj["d_r1_loss"].append(float(dr["d_r1_loss"]))
        state, gm = g_step(state, (zs[(i + 1) % 4],), pred_params)
        traj["g_loss"].append(float(gm["g_loss"]))
        if i % cfg.g_reg_every == 0:
            state, gr = g_reg_step(state, (zs[(i + 2) % 4][:path_batch],))
            traj["g_path_loss"].append(float(gr["g_path_loss"]))
    del state, h
    return traj


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=48)
    ap.add_argument("--batch", type=int, default=16,
                    help="must be a multiple of the config's mini_batch (16)")
    ap.add_argument("--ab", default="mixed_precision",
                    choices=("mixed_precision", "predictor_dtype"),
                    help="which knob the two legs toggle")
    args = ap.parse_args()

    import jax

    from bench import _setup_jax

    on_tpu = jax.devices()[0].platform != "cpu"
    _setup_jax(on_tpu)  # persistent compile cache — 8 executables otherwise
    if not on_tpu:
        # CPU smoke: tiny harness (build_train_harness shrinks shapes itself)
        args.iters = min(args.iters, 5)

    bf16 = run_trajectory(True, args.iters, args.batch, on_tpu, ab=args.ab)
    gc.collect()
    f32 = run_trajectory(False, args.iters, args.batch, on_tpu, ab=args.ab)

    ok = True
    for m in METRICS:
        a, b = np.asarray(bf16[m]), np.asarray(f32[m])
        if not (np.isfinite(a).all() and np.isfinite(b).all()):
            ok = False
        # first recorded value is pre-chaos: same state, same inputs — only
        # the compute dtype differs, so it isolates pure rounding error
        denom = max(abs(b[0]), 1e-6)
        first_rel = abs(a[0] - b[0]) / denom
        mean_rel = abs(a.mean() - b.mean()) / max(abs(b.mean()), 1e-6)
        print(json.dumps({
            "metric": m,
            "bf16_mean": round(float(a.mean()), 5),
            "f32_mean": round(float(b.mean()), 5),
            "bf16_std": round(float(a.std()), 5),
            "f32_std": round(float(b.std()), 5),
            "first_iter_rel_delta": round(float(first_rel), 6),
            "mean_rel_delta": round(float(mean_rel), 5),
            "finite": bool(np.isfinite(a).all() and np.isfinite(b).all()),
        }))
    print(json.dumps({"verdict": "finite" if ok else "NONFINITE",
                      "ab": args.ab,
                      "iters": args.iters, "batch": args.batch,
                      "note": "trajectory-level agreement; not FID parity"}))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
