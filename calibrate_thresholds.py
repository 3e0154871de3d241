#!/usr/bin/env python
"""Contrastive threshold-calibration harness.

Behavior contract: the reference's `losses/loss_model.py __main__` harness
(:323-520) — compute per-layer feature lists of a chosen predictor over N
images, split even/odd into signatures/queries, and plot per-layer
same / 2nd-best-not-same / all-not-same distance histograms with
percentiles. The configs' lower_thres/upper_thres were calibrated from
these plots; JAX-port numerics (resize, BGR, crop) can shift distance
scales, so this tool re-derives them for the TPU port.

Outputs, per layer:
  - `<out>/<loss>_layer_<i>.jpg` histogram (same / not_same_2nd_best /
    all_not_same, p20/p50/p80 markers),
  - `<out>/<loss>_thresholds.json` with the percentile table and suggested
    starting values: lower_thres = p20(same), upper_thres = p50(all_not_same)
    per layer (starting points — inspect the histograms as the reference
    authors did).

Usage:
  python calibrate_thresholds.py --config_path gan_control_tpu/configs/ffhq.json \
      --loss embedding_loss [--num_images 1000] [--batch_size 40] [--out graphs]
"""

from __future__ import annotations

import argparse
import json
import os
from pathlib import Path

import numpy as np

from gan_control_tpu.evaluation.separability import separability_stats


def per_layer_same_not_same(
    feature_chunks: list[list[np.ndarray]],
    dist_fns: list,
    chunk: int = 32,
) -> list[dict]:
    """signatures = even rows, queries = odd rows (reference
    get_same_not_same_list, loss_model.py:298-305). Returns per layer
    {'same', 'not_same', 'all_not_same'} arrays."""
    import jax
    import jax.numpy as jnp

    n_layers = len(feature_chunks[0])
    layers = [
        np.concatenate([c[li] for c in feature_chunks], axis=0)
        for li in range(n_layers)
    ]
    out = []
    for li, feats in enumerate(layers):
        sig, qry = feats[::2], feats[1::2]
        n = min(len(sig), len(qry))
        sig, qry = sig[:n], qry[:n]
        dist_fn = jax.jit(dist_fns[li])
        # chunked [n, n] distance matrix (reference _iterate_chunk_pairs)
        rows = []
        for i in range(0, n, chunk):
            cols = [
                np.asarray(dist_fn(jnp.asarray(sig[i : i + chunk]),
                                   jnp.asarray(qry[j : j + chunk])))
                for j in range(0, n, chunk)
            ]
            rows.append(np.concatenate(cols, axis=1))
        d = np.concatenate(rows, axis=0)
        out.append(separability_stats(d))
    return out


def dist_fns_for(spec) -> list:
    """Per-layer distance functions: L1 for intermediates, the loss's own
    criterion for the last layer (and everywhere with intermediate_as_last;
    reference calc_distances_list, loss_model.py:238-250)."""
    from gan_control_tpu.losses.contrastive import pairwise_l1, pairwise_sq_l2
    from gan_control_tpu.losses.registry import PAIRWISE_DIST

    last = (
        spec.pair_dist_fn
        or PAIRWISE_DIST.get(spec.name)
        or PAIRWISE_DIST.get("recon_3d_loss" if spec.name.startswith("recon_") else "")
        or pairwise_sq_l2
    )
    n_layers = len(spec.cfg.weights)
    fns = []
    for li in range(n_layers):
        if li == n_layers - 1 or spec.cfg.intermediate_as_last:
            fns.append(last)
        else:
            fns.append(pairwise_l1)
    return fns


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--config_path", required=True)
    ap.add_argument("--loss", required=True,
                    help="loss block name, e.g. embedding_loss")
    ap.add_argument("--num_images", type=int, default=1000)
    ap.add_argument("--batch_size", type=int, default=40)
    ap.add_argument("--out", default="calibration")
    ap.add_argument("--precision", default=None,
                    choices=("default", "tensorfloat32", "highest"),
                    help="predictor conv/matmul precision for this run "
                    "(A/B the bf16-vs-f32 distance-scale drift; default: "
                    "GANCTL_PREDICTOR_PRECISION, else the training "
                    "battery's 'default' single-pass-bf16 mode so "
                    "thresholds match training-time distances)")
    ap.add_argument("--dtype", default="float32",
                    choices=("float32", "bfloat16"),
                    help="battery STORAGE dtype for this run — matches "
                    "training_config.predictor_dtype so calibrated "
                    "thresholds see the same feature numerics as the "
                    "train step (features are upcast to f32 before "
                    "distances, exactly like the contrastive loss)")
    args = ap.parse_args(argv)
    if args.precision is not None:
        import os

        from gan_control_tpu.utils.precision import ENV_VAR

        os.environ[ENV_VAR] = args.precision

    import jax

    from gan_control_tpu.data.datasets import get_data_loader
    from gan_control_tpu.losses.registry import build_attr_losses
    from gan_control_tpu.utils.config import read_json
    from gan_control_tpu.utils.plotting import plot_hist

    config = read_json(args.config_path)
    tc = dict(config["training_config"])
    # enable ONLY the requested loss (sub-losses of recon_3d stay nested)
    base = args.loss.replace("recon_", "").replace("_loss", "")
    for key in list(tc.keys()):
        if key.endswith("_loss") and isinstance(tc[key], dict):
            tc[key] = dict(tc[key])
            tc[key]["enabled"] = (
                key == args.loss
                or (args.loss.startswith("recon_") and key == "recon_3d_loss")
            )
    if args.loss.startswith("recon_") and args.loss != "recon_3d_loss":
        blk = dict(tc["recon_3d_loss"])
        for sub in ("id", "ex", "tex", "angles", "gamma", "xy", "z"):
            sub_key = f"{sub}_loss"
            if isinstance(blk.get(sub_key), dict):
                b = dict(blk[sub_key])
                b["enabled"] = sub == base
                blk[sub_key] = b
        tc["recon_3d_loss"] = blk

    specs, params = build_attr_losses(tc)
    if args.dtype != "float32":
        # match training exactly under the bf16 battery plan: params are
        # STORED in the battery dtype there too (trainer init), so the
        # calibrated thresholds must see the same rounded weights
        from gan_control_tpu.losses.registry import cast_predictor_params

        params = cast_predictor_params(params, args.dtype)
    spec = next((s for s in specs if s.name == args.loss), None)
    if spec is None:
        raise SystemExit(
            f"loss {args.loss!r} not found/enabled; available: "
            f"{[s.name for s in specs]}"
        )

    size = config["model_config"]["size"]
    loader = get_data_loader(config.get("data_config", {}), args.batch_size, size)

    # params are a traced ARGUMENT, not a closure constant: closed-over
    # weight trees get baked into the compile payload, which oversizes
    # remote-compile links (the age VGG16 exceeded the tunnel's request
    # limit) — same convention as the trainer's cached predictor jits
    dtype = jax.numpy.dtype(args.dtype)
    feature_fn = jax.jit(
        lambda pp, imgs: [
            f.astype(jax.numpy.float32)
            for f in spec.feature_fn(pp, imgs.astype(dtype))
        ]
    )
    chunks = []
    seen = 0
    while seen < args.num_images:
        imgs = next(loader)
        feats = feature_fn(params[spec.name], jax.numpy.asarray(imgs))
        chunks.append([np.asarray(f) for f in feats])
        seen += imgs.shape[0]
        print(f"features: {seen}/{args.num_images}")

    stats = per_layer_same_not_same(chunks, dist_fns_for(spec))

    out_dir = Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)
    table = {}
    for li, s in enumerate(stats):
        plot_hist(
            [s["same"], s["not_same"], s["all_not_same"]],
            title=f"{args.loss} layer {li}",
            labels=["same", "not_same_2nd_best", "all_not_same"],
            xlabel="distance",
            bins=100,
            percentiles=(0.2, 0.5, 0.8),
            save_path=out_dir / f"{args.loss}_layer_{li}.jpg",
        )
        pct = lambda a, q: float(np.percentile(a, q)) if len(a) else float("nan")
        table[f"layer_{li}"] = {
            "same": {f"p{q}": pct(s["same"], q) for q in (20, 50, 80)},
            "not_same_2nd_best": {f"p{q}": pct(s["not_same"], q) for q in (20, 50, 80)},
            "all_not_same": {f"p{q}": pct(s["all_not_same"], q) for q in (20, 50, 80)},
            "suggested": {
                "lower_thres": pct(s["same"], 20),
                "upper_thres": pct(s["all_not_same"], 50),
            },
        }
        print(f"layer {li}: {json.dumps(table[f'layer_{li}']['suggested'])}")
    json_path = out_dir / f"{args.loss}_thresholds.json"
    json_path.write_text(json.dumps(table, indent=2))
    print(f"wrote {json_path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
