"""Controlled-inference walkthrough — the script form of the reference's
(stripped) notebooks/gan_control_inference_example.ipynb (README.md:45,
listed in .MISSING_LARGE_BLOBS).

Given a trained controller dir, demonstrates:
  1. unconditional generation with per-group truncation,
  2. setting explicit controls (pose / age / hair / illumination),
  3. per-group interpolation gifs,
  4. recovering controls from generated images and re-applying them to a new
     identity (runs when the generator's args.json carries enabled predictor
     loss blocks; needs converted predictor checkpoints for meaningful values).

Usage:
    python examples/inference_example.py --controller_dir <dir> --out out/
"""

import argparse
import os
import sys
from pathlib import Path

# runnable as `python examples/inference_example.py` from anywhere
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--controller_dir", required=True)
    parser.add_argument("--out", default="inference_out")
    parser.add_argument("--batch", type=int, default=4)
    args = parser.parse_args()

    import jax

    if os.environ.get("JAX_PLATFORMS"):
        # a sitecustomize on TPU boxes may pin the platform; honor an
        # explicit env override (e.g. JAX_PLATFORMS=cpu for a dry run)
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    import numpy as np

    from gan_control_tpu.inference.controller import Controller
    from gan_control_tpu.inference.interpolation import interpolate_by_group, save_gif
    from gan_control_tpu.evaluation.generation import save_image_grid
    from gan_control_tpu.utils.spherical_harmonics import gamma_from_direction

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    ctrl = Controller(args.controller_dir)
    rng = jax.random.PRNGKey(0)

    # 1. unconditional samples (truncation 0.7 toward the per-group mean w)
    imgs, z, w = ctrl.gen_batch(batch_size=args.batch, truncation=0.7, rng=rng)
    save_image_grid(np.asarray(imgs), out / "samples.jpg", nrow=args.batch)

    # 2. explicit controls on a FIXED latent: same people, new attributes
    controls = {}
    if "orientation" in ctrl.fc_controls:
        controls["orientation"] = np.tile([[25.0, 5.0, 0.0]], (args.batch, 1))
    if "age" in ctrl.fc_controls:
        controls["age"] = np.full((args.batch, 1), 60.0)
    if "hair" in ctrl.fc_controls:
        controls["hair"] = np.tile([[0.9, 0.2, 0.2]], (args.batch, 1))  # red
    if "gamma" in ctrl.fc_controls:
        controls["gamma"] = np.tile(
            gamma_from_direction(1.0, 0.0, 0.5)[None], (args.batch, 1)
        )
    if controls:
        imgs2, _, _ = ctrl.gen_batch_by_controls(
            batch_size=args.batch, latent=z, rng=rng, **controls
        )
        save_image_grid(np.asarray(imgs2), out / "controlled.jpg", nrow=args.batch)

    # 3. per-group interpolation gif (first controllable group)
    for group in list(ctrl.fc_controls)[:1]:
        if group == "expression_q":
            continue
        g = ctrl.spec.group(group)
        frames, _ = interpolate_by_group(
            ctrl.model, ctrl.params, (g.latent_start, g.latent_end),
            jax.random.PRNGKey(1), batch=args.batch,
            num_of_intermediate_latents=2, pics_per_interpolation=6,
            style_dim=ctrl.config["model_config"].get("latent_size", 512),
        )
        save_gif(frames, out / f"interp_{group}.gif", nrow=args.batch)

    # 4. recover controls from the generated batch and re-apply them to a
    #    NEW identity — the predictor battery runs only when the phase-1
    #    config (generator/args.json) has enabled loss blocks
    import jax.numpy as jnp

    tc = ctrl.config.get("training_config", {})
    extractable = {
        k: tc[k]
        for k in ("orientation_loss", "age_loss", "hair_loss")
        if isinstance(tc.get(k), dict) and tc[k].get("enabled")
    }
    if extractable:
        from gan_control_tpu.inference.extract_controls import ControlExtractor

        extractor = ControlExtractor(extractable)
        recovered = extractor.extract(np.asarray(imgs) * 2.0 - 1.0)
        reapply = {}
        for group, col in (("orientation", "orientation"), ("age", "age"),
                           ("hair", "hair")):
            if col in recovered and group in ctrl.fc_controls:
                v = np.asarray(recovered[col], np.float32)
                reapply[group] = jnp.asarray(v.reshape(len(v), -1))
        if reapply:
            imgs3, _, _ = ctrl.gen_batch_by_controls(
                batch_size=args.batch, rng=jax.random.PRNGKey(7), **reapply
            )
            save_image_grid(np.asarray(imgs3), out / "recovered_controls.jpg",
                            nrow=args.batch)
    else:
        print("step 4 (extract controls) skipped: generator args.json has no "
              "enabled predictor loss blocks")

    print(f"wrote {sorted(p.name for p in out.iterdir())} -> {out}")


if __name__ == "__main__":
    main()
