#!/usr/bin/env python
"""bf16-vs-f32 predictor drift measurement (VERDICT r2 item 2).

Runs the threshold-calibration harness twice on IDENTICAL synthetic
images — once with single-pass-bf16 convs (GANCTL_PREDICTOR_PRECISION=
default, the TPU conv unit's native mode) and once with true-f32
accumulation (=highest, the shipped default / torch-reference parity) —
and prints the per-layer drift of the suggested contrastive thresholds.
The drift table recorded in WEIGHTS.md justifies (or amends) shipping the
reference's f32-calibrated thresholds.

Run on the TPU:
  python tools/precision_drift.py [--loss embedding_loss orientation_loss]
                                  [--num_images 256] [--batch_size 32]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--loss", nargs="*", default=["embedding_loss"])
    ap.add_argument("--num_images", type=int, default=256)
    ap.add_argument("--batch_size", type=int, default=32)
    ap.add_argument("--storage", action="store_true",
                    help="add a third leg: single-pass-bf16 convs WITH "
                    "bf16 feature storage (training_config.predictor_dtype"
                    "='bfloat16') — the drift of the bf16-battery plan")
    ap.add_argument("--out", default="/tmp/precision_drift")
    ap.add_argument("--config_path",
                    default=os.path.join(os.path.dirname(os.path.dirname(
                        os.path.abspath(__file__))),
                        "gan_control_tpu", "configs", "ffhq.json"))
    args = ap.parse_args(argv)

    import calibrate_thresholds as cal

    # same config, synthetic deterministic data (seed 0): both precision
    # runs see IDENTICAL images, so any threshold difference is numerics
    config = json.load(open(args.config_path))
    config["data_config"] = {"data_set_name": "synthetic", "path": ""}
    fd, cfg_path = tempfile.mkstemp(suffix=".json")
    with os.fdopen(fd, "w") as f:
        json.dump(config, f)

    legs = [("default", "float32"), ("highest", "float32")]
    if args.storage:
        legs.append(("default", "bfloat16"))
    for loss in args.loss:
        tables = {}
        for prec, dtype in legs:
            tag = prec if dtype == "float32" else f"{prec}-{dtype}"
            out_dir = os.path.join(args.out, tag)
            cal.main([
                "--config_path", cfg_path, "--loss", loss,
                "--num_images", str(args.num_images),
                "--batch_size", str(args.batch_size),
                "--out", out_dir, "--precision", prec,
                "--dtype", dtype,
            ])
            tables[tag] = json.load(
                open(os.path.join(out_dir, f"{loss}_thresholds.json"))
            )

        print(f"\n=== {loss}: suggested-threshold drift vs f32 'highest' ===")
        header = f"{'layer':8} {'thr':6} {'f32':>12} {'bf16':>12} {'drift %':>9}"
        if args.storage:
            header += f" {'bf16-store':>12} {'drift %':>9}"
        print(header)
        for layer in tables["highest"]:
            for key in ("lower_thres", "upper_thres"):
                hi = tables["highest"][layer]["suggested"][key]
                lo = tables["default"][layer]["suggested"][key]
                drift = 100.0 * (lo - hi) / hi if hi else float("nan")
                line = (f"{layer:8} {key[:5]:6} {hi:12.6g} {lo:12.6g} "
                        f"{drift:8.3f}%")
                if args.storage:
                    st = tables["default-bfloat16"][layer]["suggested"][key]
                    sdrift = 100.0 * (st - hi) / hi if hi else float("nan")
                    line += f" {st:12.6g} {sdrift:8.3f}%"
                print(line)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
