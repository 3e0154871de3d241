"""Phase-2a CLI: sample the frozen GAN, run every predictor, store
{attribute value : w latent} rows in a pandas DataFrame.

Behavior contract (reference src/gan_control/make_attributes_df.py:30-89):
columns latents / latents_w / age / orientation (yaw,pitch,roll) /
expression_q / hair / gamma3d / expression3d / orientation3d / arcface_emb;
periodic pickles; 100K samples default at batch 40.

The reference's per-image 3D face alignment (FAN landmarks + similarity
warp before R-Net) is the ``--align_3d`` option; the alignment-free path
(reference ``align_3d=False``, :43-47) is the default here — see
gan_control_tpu/alignment for the alignment port.

Usage:
    python make_attributes_df.py --model_dir <phase1 dir> --save_path df.pkl
"""

from __future__ import annotations

import argparse
import os


def _setup_cache():
    """Persistent XLA compile cache (compiles over a remote-TPU link are
    minutes each; the cache makes reruns instant)."""
    import os

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("GANCTL_COMPILE_CACHE", "/tmp/gan_control_compile_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model_dir", type=str, required=True)
    parser.add_argument("--batch_size", type=int, default=40)
    parser.add_argument("--number_of_samples", type=int, default=100_000)
    parser.add_argument("--save_path", type=str, required=True)
    parser.add_argument("--align_3d", action="store_true",
                        help="3D-align faces before the R-Net (needs the "
                        "face-alignment port; default off)")
    parser.add_argument("--fan_weights", type=str, default=None,
                        help="path to a 1adrianb 2D/3DFAN-4 torch "
                        "checkpoint; without it --align_3d falls back to "
                        "the alignment-free bicubic resize (warns loudly)")
    parser.add_argument("--detector", type=str, default=None,
                        choices=["sfd", "blazeface"],
                        help="face detector feeding FAN its crop box "
                        "(reference api.py:116-190); default: whole-image "
                        "box (valid for centered generator output)")
    parser.add_argument("--detector_weights", type=str, default=None,
                        help="torch checkpoint for --detector")
    parser.add_argument("--depth_weights", type=str, default=None,
                        help="1adrianb depth checkpoint: decode "
                        "LandmarksType._3D z per landmark (api.py:168-182)")
    parser.add_argument("--no_shard", action="store_true",
                        help="disable sharding the sweep over the device "
                        "mesh (single-device batches)")
    args = parser.parse_args()
    if (args.detector or args.depth_weights) and not args.fan_weights:
        parser.error("--detector/--depth_weights require --fan_weights "
                     "(FAN landmarks are what consume them)")
    if args.detector and not args.detector_weights:
        parser.error("--detector requires --detector_weights")
    _setup_cache()

    import numpy as np
    import pandas as pd
    import jax

    from gan_control_tpu.inference.extract_controls import ControlExtractor
    from gan_control_tpu.inference.inference import Inference

    model = Inference(args.model_dir)
    tc = model.config["training_config"]

    align_fn = None
    if args.align_3d:
        from gan_control_tpu.alignment import make_align_fn

        fan_params = None
        detector_params = None
        depth_params = None
        if args.fan_weights:
            from gan_control_tpu.alignment import fan as fan_mod

            fan_params = fan_mod.convert_torch_weights(args.fan_weights)
        if args.detector:
            if args.detector == "sfd":
                from gan_control_tpu.alignment import sfd as det_mod
            else:
                from gan_control_tpu.alignment import blazeface as det_mod
            detector_params = det_mod.convert_torch_weights(
                args.detector_weights
            )
        if args.depth_weights:
            from gan_control_tpu.alignment import depth as depth_mod

            depth_params = depth_mod.convert_torch_weights(args.depth_weights)
        align_fn = make_align_fn(
            fan_params,
            detector=args.detector,
            detector_params=detector_params,
            depth_params=depth_params,
        )

    # the shared predictor battery (jitted forwards, torch-weight loading,
    # DataFrame column naming) lives in ControlExtractor — one codepath for
    # phase 2a and for extracting controls from real photos
    extractor = ControlExtractor(
        tc, align_fn=align_fn, rng=jax.random.PRNGKey(1), align_3d=args.align_3d
    )

    # shard the sweep over the device mesh: z is committed batch-sharded, so
    # the already-jitted generation and predictor programs partition over the
    # data axis (GSPMD) — the 100K-sample sweep scales linearly over chips.
    # z is pre-sampled with gen_batch's own rng split discipline, so sharded
    # and unsharded runs produce identical rows (tested).
    sharding = None
    if not args.no_shard:
        from gan_control_tpu.utils.mesh import data_batch_sharding

        sharding = data_batch_sharding(args.batch_size, label="attribute sweep")
    style_dim = model.config["model_config"].get("latent_size", 512)

    rows = []
    rng = jax.random.PRNGKey(0)
    n_batches = args.number_of_samples // args.batch_size
    for b in range(n_batches):
        rng, k = jax.random.split(rng)
        z = None
        if sharding is not None:
            _, k_z, _ = jax.random.split(k, 3)  # gen_batch's own split
            z = jax.device_put(
                jax.random.normal(k_z, (args.batch_size, style_dim)), sharding
            )
        out, latent, latent_w = model.gen_batch(
            batch_size=args.batch_size, normalize=False, latent=z, rng=k
        )
        latent_np = np.asarray(latent)
        w_np = np.asarray(latent_w)[:, 0, :]  # per-image w (identical rows of w+)

        cols = extractor.extract(out)

        for i in range(args.batch_size):
            row = {"latents": latent_np[i], "latents_w": w_np[i]}
            for name, arr in cols.items():
                row[name] = arr[i] if arr.ndim > 1 else float(arr[i])
            rows.append(row)

        if len(rows) % 50_000 == 0 or b == n_batches - 1:
            os.makedirs(os.path.dirname(os.path.abspath(args.save_path)), exist_ok=True)
            pd.DataFrame(rows).to_pickle(args.save_path)
            print(f"saved {len(rows)} rows -> {args.save_path}")


if __name__ == "__main__":
    main()
