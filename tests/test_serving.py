"""ServingController: one-dispatch controlled generation for serving loops.

Asserts the three properties the module docstring promises
(gan_control_tpu/inference/serving.py):
  - numeric parity with the reference-faithful
    ``Controller.gen_batch_by_controls`` path,
  - bucket padding never changes the first ``n`` results and never
    recompiles within a bucket,
  - ``warmup()`` precompiles the ladder so live traffic hits the cache.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gan_control_tpu.models.controller import FcStack
from gan_control_tpu.models.factory import build_generator, build_group_spec
from gan_control_tpu.utils import checkpoint as ckpt_lib
from gan_control_tpu.utils.config import write_json

STYLE = 64
SIZE = 16


def tiny_model_config():
    return {
        "save_name": "tiny",
        "model_config": {
            "vanilla": False,
            "img_channels": 3,
            "split_fc": True,
            "marge_fc": False,
            "latent_size": STYLE,
            "size": SIZE,
            "n_mlp": 2,
            "channel_multiplier": 0.25,
            "max_channels": 32,
            "g_noise_mode": "normal",
        },
        "training_config": {
            "batch": 8,
            "mini_batch": 8,
            "sub_groups_dict": {
                "orientation": {"place_in_mini_batch": [0, 4], "place_in_latent": [0, 24]},
                "expression": {"place_in_mini_batch": [4, 6], "place_in_latent": [24, 48]},
                "other": {"place_in_mini_batch": [6, 8], "place_in_latent": [48, 64]},
            },
        },
    }


@pytest.fixture(scope="module")
def controller_root(tmp_path_factory):
    """A self-contained controller dir (generator + one orientation head) in
    the reference layout, built directly — no training needed."""
    root = tmp_path_factory.mktemp("serving_ctrl")

    gen_dir = root / "generator"
    gen_dir.mkdir()
    config = tiny_model_config()
    write_json(config, gen_dir / "args.json")
    spec = build_group_spec(config)
    gen = build_generator(config, spec)
    z = jnp.zeros((1, STYLE))
    params = gen.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}, [z]
    )
    ckpt_lib.save_checkpoint(gen_dir / "checkpoint", {"g_ema": params}, 1)

    def make_head(name: str, in_dim: int, out_dim: int, seed: int):
        cdir = root / f"{name}_serve"
        cdir.mkdir()
        write_json(
            {"model_config": {"n_mlp": 2, "mid_dim": 32, "in_dim": in_dim,
                              "lr_mlp": 0.01}},
            cdir / "args.json",
        )
        fc = FcStack(n_mlp=2, mid_dim=32, out_dim=out_dim, lr_mlp=0.01)
        fc_params = fc.init(jax.random.PRNGKey(seed), jnp.zeros((1, in_dim)))
        ckpt_lib.save_checkpoint(cdir / "checkpoint", {"controller": fc_params}, 1)

    make_head("orientation", 3, 24, seed=2)
    # both expression heads map onto the 'expression' group slice: the 64-d
    # 3DMM head and the 8-class expression_q alternative (routing + warmup
    # dual-set coverage)
    make_head("expression", 64, 24, seed=3)
    make_head("expression_q", 8, 24, seed=4)
    return root


@pytest.fixture(scope="module")
def serving(controller_root):
    from gan_control_tpu.inference.serving import ServingController

    return ServingController(controller_root, buckets=(4, 8))


def _orientation(n, seed=0):
    return np.random.default_rng(seed).normal(size=(n, 3)).astype(np.float32) * 10.0


def test_parity_with_gen_batch_by_controls(controller_root, serving):
    """Padded one-dispatch serving returns the same triple as the
    reference-faithful multi-dispatch path (same rng, same latent)."""
    from gan_control_tpu.inference.controller import Controller

    ctrl = Controller(controller_root)
    n = 3  # pads to bucket 4
    z = np.asarray(jax.random.normal(jax.random.PRNGKey(7), (n, STYLE)))
    controls = _orientation(n)

    img_ref, z_ref, w_ref = ctrl.gen_batch_by_controls(
        latent=z, rng=jax.random.PRNGKey(3), orientation=controls
    )
    img, z_out, w_out = serving.generate(
        latent=z, rng=jax.random.PRNGKey(3), orientation=controls
    )
    assert img.shape == (n, SIZE, SIZE, 3)
    np.testing.assert_allclose(img, np.asarray(img_ref), atol=2e-5)
    np.testing.assert_allclose(z_out, np.asarray(z_ref), atol=1e-6)
    np.testing.assert_allclose(w_out, np.asarray(w_ref), atol=2e-5)
    # the controlled slice is exactly the controller head's output
    want = np.asarray(ctrl.generate_group_w_latent("orientation", controls))
    got = w_out[:, 0, :24] if w_out.ndim == 3 else w_out[:, :24]
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_bucket_reuse_no_recompile(serving):
    """Different request sizes within one bucket share one compiled
    executable; only a new bucket adds a trace."""
    heads = (("orientation", "orientation"),)
    serving.generate(batch_size=2, rng=jax.random.PRNGKey(0),
                     orientation=_orientation(2))
    fn = serving._serve_cache[(heads, False, True, False)]
    n_traces = fn._cache_size()
    serving.generate(batch_size=3, rng=jax.random.PRNGKey(1),
                     orientation=_orientation(3))
    assert fn._cache_size() == n_traces, "same-bucket request recompiled"
    serving.generate(batch_size=6, rng=jax.random.PRNGKey(2),
                     orientation=_orientation(6))
    assert fn._cache_size() == n_traces + 1


def test_bucket_ladder(serving):
    assert serving.bucket_for(1) == 4
    assert serving.bucket_for(4) == 4
    assert serving.bucket_for(5) == 8
    with pytest.raises(ValueError, match="exceeds the largest bucket"):
        serving.bucket_for(9)
    with pytest.raises(ValueError, match="control 'orientation' has 2 rows"):
        serving.generate(batch_size=3, orientation=_orientation(2))
    with pytest.raises(ValueError, match="no controller for group"):
        serving.generate(batch_size=2, hair=_orientation(2))


def test_warmup_precompiles_ladder(controller_root):
    """After warmup, live requests of any size <= the ladder max hit the
    compiled cache — zero additional traces. With both expression heads
    present, warmup compiles the joint primary set (64-d expression +
    orientation) plus the expression_q variant as a second set."""
    from gan_control_tpu.inference.serving import ServingController

    sc = ServingController(controller_root, buckets=(2, 4))
    sc.warmup()
    key_primary = ((("expression", "expression"),
                    ("orientation", "orientation")), False, True, False)
    key_q = ((("expression", "expression_q"),), False, True, False)
    assert key_primary in sc._serve_cache and key_q in sc._serve_cache
    fn = sc._serve_cache[key_primary]
    assert fn._cache_size() == 2  # one trace per ladder rung
    assert sc._serve_cache[key_q]._cache_size() == 2
    img, _, _ = sc.generate(
        batch_size=3, rng=jax.random.PRNGKey(5),
        orientation=_orientation(3),
        expression=np.zeros((3, 64), np.float32),
    )
    assert fn._cache_size() == 2, "warmed request recompiled"
    assert img.shape == (3, SIZE, SIZE, 3)
    assert np.isfinite(img).all()


def test_expression_q_routing(controller_root, serving):
    """An 8-column expression control routes to the expression_q head; a
    64-column one to the 3DMM head — both writing the 'expression' group
    slice, matching gen_batch_by_controls."""
    from gan_control_tpu.inference.controller import Controller

    ctrl = Controller(controller_root)
    n = 2
    z = np.asarray(jax.random.normal(jax.random.PRNGKey(21), (n, STYLE)))

    e8 = np.eye(8, dtype=np.float32)[:n]
    img_s, _, w_s = serving.generate(latent=z, rng=jax.random.PRNGKey(8),
                                     expression=e8)
    img_r, _, w_r = ctrl.gen_batch_by_controls(batch_size=n, latent=z,
                                               rng=jax.random.PRNGKey(8),
                                               expression=e8)
    np.testing.assert_allclose(img_s, np.asarray(img_r), atol=2e-5)
    want_q = np.asarray(ctrl.generate_group_w_latent("expression_q", e8))
    got = w_s[:, 0, 24:48] if w_s.ndim == 3 else w_s[:, 24:48]
    np.testing.assert_allclose(got, want_q, rtol=1e-4, atol=1e-5)

    e64 = np.asarray(jax.random.normal(jax.random.PRNGKey(22), (n, 64)))
    _, _, w64 = serving.generate(latent=z, rng=jax.random.PRNGKey(9),
                                 expression=e64)
    want_64 = np.asarray(ctrl.generate_group_w_latent("expression", e64))
    got64 = w64[:, 0, 24:48] if w64.ndim == 3 else w64[:, 24:48]
    np.testing.assert_allclose(got64, want_64, rtol=1e-4, atol=1e-5)


def test_meshed_serving_parity(controller_root, serving):
    """mesh=8-device: the request batch-shards over the mesh and returns
    the same images as the single-device serving path; non-divisible
    buckets are rejected at init."""
    from jax.sharding import Mesh

    from gan_control_tpu.inference.serving import ServingController

    mesh = Mesh(np.array(jax.devices()), ("data",))
    with pytest.raises(ValueError, match="not divisible"):
        ServingController(controller_root, buckets=(4, 8), mesh=mesh)

    meshed = ServingController(controller_root, buckets=(8, 16), mesh=mesh)
    n = 5  # pads to bucket 8 -> 1 row per device
    z = np.asarray(jax.random.normal(jax.random.PRNGKey(11), (n, STYLE)))
    controls = _orientation(n, seed=4)
    img_m, _, w_m = meshed.generate(latent=z, rng=jax.random.PRNGKey(6),
                                    orientation=controls)
    img_s, _, w_s = serving.generate(latent=z, rng=jax.random.PRNGKey(6),
                                     orientation=controls)
    assert img_m.shape == (n, SIZE, SIZE, 3)
    np.testing.assert_allclose(img_m, img_s, atol=2e-5)
    np.testing.assert_allclose(w_m, w_s, atol=2e-5)


def test_random_noise_path(serving):
    """static_noise=False draws fresh injection noise inside the fused
    executable (rng-keyed, still one dispatch)."""
    img1, _, _ = serving.generate(batch_size=2, rng=jax.random.PRNGKey(0),
                                  static_noise=False,
                                  orientation=_orientation(2))
    img2, _, _ = serving.generate(batch_size=2, rng=jax.random.PRNGKey(1),
                                  static_noise=False,
                                  orientation=_orientation(2))
    assert img1.shape == (2, SIZE, SIZE, 3)
    assert np.isfinite(img1).all() and np.isfinite(img2).all()
    assert not np.allclose(img1, img2)


def test_export_artifacts_roundtrip(controller_root, serving, tmp_path):
    """export_artifacts -> load_exported_serving serves identical images
    with NO model objects: the StableHLO artifacts embed the weights, and
    the loader reproduces generate()'s bucket/pad/slice + rng discipline."""
    from gan_control_tpu.inference.serving import load_exported_serving

    out = tmp_path / "artifacts"
    manifest = serving.export_artifacts(out, groups=["orientation"],
                                        buckets=(4,))
    assert (out / "manifest.json").exists()
    assert all((out / e["file"]).stat().st_size > 0
               for e in manifest["artifacts"])

    exported = load_exported_serving(out)
    z = np.asarray(jax.random.normal(jax.random.PRNGKey(11), (3, STYLE)))
    kwargs = dict(latent=z, rng=jax.random.PRNGKey(5),
                  orientation=_orientation(3))
    img_live, _, w_live = serving.generate(**kwargs)
    img_exp, _, w_exp = exported.generate(**kwargs)
    np.testing.assert_allclose(img_exp, img_live, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(w_exp, w_live, rtol=1e-5, atol=1e-5)

    # unknown group set / oversized batch fail loudly
    with pytest.raises(ValueError):
        exported.generate(batch_size=2, age=np.zeros((2, 1), np.float32))
    with pytest.raises(ValueError):
        exported.generate(batch_size=64, orientation=_orientation(64))

    # groups=[] exports the uncontrolled z->image path
    serving.export_artifacts(tmp_path / "plain", groups=[], buckets=(4,))
    plain = load_exported_serving(tmp_path / "plain")
    img_p, _, w_p = plain.generate(latent=z, rng=jax.random.PRNGKey(5))
    img_l, _, w_l = serving.generate(latent=z, rng=jax.random.PRNGKey(5))
    np.testing.assert_allclose(img_p, img_l, rtol=1e-5, atol=1e-5)


def test_export_cross_platform(serving, tmp_path):
    """Artifacts can be lowered for a TPU fleet from this CPU host
    (jax.export multi-platform lowering); a cpu+tpu artifact still runs
    here via its cpu lowering."""
    from gan_control_tpu.inference.serving import load_exported_serving

    out = tmp_path / "xplat"
    manifest = serving.export_artifacts(
        out, groups=["orientation"], buckets=(4,), platforms=("cpu", "tpu")
    )
    assert all(e["platforms"] == ["cpu", "tpu"] for e in manifest["artifacts"])
    exported = load_exported_serving(out)
    img, _, _ = exported.generate(batch_size=2, rng=jax.random.PRNGKey(0),
                                  orientation=_orientation(2))
    assert img.shape == (2, SIZE, SIZE, 3) and np.isfinite(img).all()


def test_random_noise_bucket_invariance(controller_root):
    """static_noise=False keeps the padding-invariance contract: the same
    request (same rng, same latent) through ladders that pad it to bucket
    4 vs bucket 8 yields identical first-n images (per-row fold_in noise
    keys — a bucket-shaped draw would differ row by row)."""
    from gan_control_tpu.inference.serving import ServingController

    a = ServingController(controller_root, buckets=(4,))
    b = ServingController(controller_root, buckets=(8,))
    z = np.asarray(jax.random.normal(jax.random.PRNGKey(3), (3, STYLE)))
    kwargs = dict(latent=z, rng=jax.random.PRNGKey(7), static_noise=False,
                  orientation=_orientation(3))
    img_a, _, w_a = a.generate(**kwargs)
    img_b, _, w_b = b.generate(**kwargs)
    np.testing.assert_allclose(img_a, img_b, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(w_a, w_b, rtol=1e-5, atol=1e-6)


def test_uint8_output_mode(serving, tmp_path):
    """output='uint8' quantizes in-graph (4x less device->host transfer);
    values match the float path within 1/255, and the exported-artifact
    manifest records the mode."""
    from gan_control_tpu.inference.serving import load_exported_serving

    z = np.asarray(jax.random.normal(jax.random.PRNGKey(2), (2, STYLE)))
    kwargs = dict(latent=z, rng=jax.random.PRNGKey(9),
                  orientation=_orientation(2))
    img_f, _, _ = serving.generate(**kwargs)
    img_u, _, _ = serving.generate(output="uint8", **kwargs)
    assert img_u.dtype == np.uint8
    np.testing.assert_allclose(img_u / 255.0, img_f, atol=0.51 / 255)

    import pytest as _pytest
    with _pytest.raises(ValueError):
        serving.generate(output="float16", **kwargs)

    out = tmp_path / "u8"
    manifest = serving.export_artifacts(out, groups=["orientation"],
                                        buckets=(4,), output="uint8")
    assert manifest["output"] == "uint8"
    exported = load_exported_serving(out)
    img_e, _, _ = exported.generate(**kwargs)
    assert img_e.dtype == np.uint8
    np.testing.assert_array_equal(img_e, img_u)
