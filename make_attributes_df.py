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
    args = parser.parse_args()
    _setup_cache()

    import numpy as np
    import pandas as pd
    import jax

    from gan_control_tpu.inference.inference import Inference
    from gan_control_tpu.losses.registry import build_attr_losses, _load_predictor

    model = Inference(args.model_dir)
    tc = model.config["training_config"]

    # instantiate the predictors used for columns (reference builds a full
    # trainer only to reach its loss classes; here the registry suffices)
    mods = {}
    for loss in ("age_loss", "orientation_loss", "expression_loss", "hair_loss",
                 "recon_3d_loss", "embedding_loss"):
        block = tc.get(loss)
        if not isinstance(block, dict) or not block.get("enabled"):
            continue
        from gan_control_tpu.losses.registry import PREDICTOR_MODULES

        pm = _load_predictor(PREDICTOR_MODULES[loss])
        m = pm.make_model(dict(block, center_crop=None) if args.align_3d else block)
        rng = jax.random.PRNGKey(hash(loss) % (2**31))
        model_path = block.get("model_path", "")
        if model_path and os.path.exists(model_path) and hasattr(pm, "convert_torch_weights"):
            params = pm.convert_torch_weights(m, model_path)
        else:
            params = pm.init_params(m, rng)
        # jit predict/features once per predictor: unjitted flax apply
        # dispatches thousands of tiny ops (catastrophic over a remote link)
        # params must be a traced ARGUMENT, not a closure constant — a
        # closed-over 500MB weight tree gets serialized into the compile
        # request (HTTP 413 over a remote-compile link)
        if loss == "recon_3d_loss":
            raw = jax.jit(lambda p, imgs, _pm=pm, _m=m: _pm.features(_m, p, imgs)[-1])
        else:
            raw = jax.jit(lambda p, imgs, _pm=pm, _m=m: _pm.predict(_m, p, imgs))
        fn = (lambda imgs, _raw=raw, _p=params: _raw(_p, imgs))
        mods[loss] = (pm, m, params, fn)

    align_fn = None
    if args.align_3d:
        from gan_control_tpu.alignment import make_align_fn

        align_fn = make_align_fn()

    rows = []
    rng = jax.random.PRNGKey(0)
    n_batches = args.number_of_samples // args.batch_size
    for b in range(n_batches):
        rng, k = jax.random.split(rng)
        out, latent, latent_w = model.gen_batch(
            batch_size=args.batch_size, normalize=False, rng=k
        )
        out_np = np.asarray(out)
        latent_np = np.asarray(latent)
        w_np = np.asarray(latent_w)[:, 0, :]  # per-image w (identical rows of w+)

        cols = {}
        if "age_loss" in mods:
            cols["age"] = np.asarray(mods["age_loss"][3](out))
        if "orientation_loss" in mods:
            cols["orientation"] = np.asarray(mods["orientation_loss"][3](out))
        if "expression_loss" in mods:
            cols["expression_q"] = np.asarray(mods["expression_loss"][3](out))
        if "hair_loss" in mods:
            cols["hair"] = np.asarray(mods["hair_loss"][3](out))
        recon_in = out
        if align_fn is not None:
            recon_in = align_fn(out)
        if "recon_3d_loss" in mods:
            pm = mods["recon_3d_loss"][0]
            vec = mods["recon_3d_loss"][3](recon_in)
            cols["gamma3d"] = np.asarray(pm.extract_feature(vec, "gamma"))
            cols["expression3d"] = np.asarray(pm.extract_feature(vec, "ex"))
            cols["orientation3d"] = np.asarray(pm.extract_feature(vec, "angles"))
        if "embedding_loss" in mods:
            cols["arcface_emb"] = np.asarray(mods["embedding_loss"][3](recon_in))

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
