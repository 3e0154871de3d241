"""Production-serving walkthrough — the deployment path the reference
never had (its inference/controller.py is a notebook API: un-jitted torch
forwards, a fresh graph per batch size). See SERVING.md for the design.

Given a trained controller dir, demonstrates:
  1. live serving: `ServingController` — the whole controlled-generation
     request compiled into ONE executable per (group-set, batch bucket),
     `warmup()` precompile, odd request sizes riding the bucket ladder
     without recompiling, in-graph uint8 output,
  2. release: `export_artifacts()` — every request executable baked into
     portable StableHLO with the weights embedded as constants,
  3. the target fleet: `load_exported_serving()` — serving the artifacts
     with NO model code, checkpoints, or configs, and verifying the
     exported path reproduces the live path bit-for-bit.

Usage:
    python examples/serving_example.py --controller_dir <dir> --out out/
"""

import argparse
import json
import os
import sys
from pathlib import Path

# runnable as `python examples/serving_example.py` from anywhere
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--controller_dir", required=True)
    parser.add_argument("--out", default="serving_out")
    args = parser.parse_args()

    import jax

    if os.environ.get("JAX_PLATFORMS"):
        # a sitecustomize on TPU boxes may pin the platform; honor an
        # explicit env override (e.g. JAX_PLATFORMS=cpu for a dry run)
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    import numpy as np

    from gan_control_tpu.inference import ServingController, load_exported_serving

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)

    # -- 1. live serving ---------------------------------------------------
    srv = ServingController(args.controller_dir, buckets=(1, 4))
    group = next(iter(srv.fc_controls))
    dim = srv.control_dim(group)
    print(f"serving groups: {sorted(srv.fc_controls)} "
          f"(demonstrating '{group}', control dim {dim})")

    srv.warmup(groups=[group])  # precompile the bucket ladder up front

    controls = {group: np.linspace(-1.0, 1.0, 3 * dim,
                                   dtype=np.float32).reshape(3, dim)}
    # batch 3 pads to the 4-bucket — no recompile, padding rows discarded
    imgs, z, w = srv.generate(batch_size=3, rng=jax.random.PRNGKey(7),
                              **controls)
    print(f"live: imgs {imgs.shape} {imgs.dtype}, z {z.shape}, w {w.shape}")

    imgs_u8, _, _ = srv.generate(batch_size=3, rng=jax.random.PRNGKey(7),
                                 output="uint8", **controls)
    assert imgs_u8.dtype == np.uint8  # quantized in-graph: 4x less transfer

    # -- 2. release: export portable artifacts ------------------------------
    artifacts = out / "artifacts"
    manifest = srv.export_artifacts(artifacts, groups=[group], buckets=(4,))
    print(f"exported {len(list(artifacts.glob('*.bin')))} StableHLO "
          f"executables -> {artifacts}")
    (out / "manifest_echo.json").write_text(json.dumps(manifest, indent=1))

    # -- 3. the target fleet: model-code-free serving -----------------------
    fleet = load_exported_serving(artifacts)
    imgs2, z2, w2 = fleet.generate(batch_size=3, rng=jax.random.PRNGKey(7),
                                   **controls)
    np.testing.assert_allclose(imgs2, imgs, rtol=0, atol=1e-5)
    np.testing.assert_array_equal(z2, z)
    print("exported path reproduces the live path (same rng discipline)")

    from gan_control_tpu.evaluation.generation import save_image_grid

    save_image_grid(imgs, out / "served.jpg", nrow=3)
    print(f"wrote {out / 'served.jpg'}")


if __name__ == "__main__":
    main()
