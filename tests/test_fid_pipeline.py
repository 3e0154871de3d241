"""FID pipeline end-to-end (random inception weights): build real-set
stats, score an identical generator distribution (low FID) vs a shifted
one (higher FID) — validates the full stats contract self-consistently."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gan_control_tpu.evaluation import fid as fid_lib
from gan_control_tpu.evaluation.inception import init_params


@pytest.mark.slow
def test_fid_pipeline_self_consistency(tmp_path):
    params = init_params(jax.random.PRNGKey(0))
    feature_fn = fid_lib.make_feature_fn(params)

    def batches(seed, shift=0.0):
        rng = np.random.default_rng(seed)
        while True:
            yield np.clip(
                rng.random((8, 64, 64, 3)).astype(np.float32) + shift, 0, 1
            )

    real = fid_lib.extract_features(feature_fn, batches(0), 64, 8)
    assert real.shape == (64, 2048)
    mu, cov = compute = fid_lib.compute_stats(real)
    stats_path = tmp_path / "stats.pkl"
    fid_lib.save_stats(stats_path, mu, cov)
    mu2, cov2 = fid_lib.load_stats(stats_path)
    np.testing.assert_allclose(mu2, mu)

    same = fid_lib.extract_features(feature_fn, batches(1), 64, 8)
    mu_s, cov_s = fid_lib.compute_stats(same)
    fid_same = fid_lib.frechet_distance(mu_s, cov_s, mu, cov)

    shifted = fid_lib.extract_features(feature_fn, batches(2, shift=0.4), 64, 8)
    mu_d, cov_d = fid_lib.compute_stats(shifted)
    fid_diff = fid_lib.frechet_distance(mu_d, cov_d, mu, cov)

    assert np.isfinite(fid_same) and np.isfinite(fid_diff)
    assert fid_diff > fid_same, (fid_same, fid_diff)


def test_extract_features_sharded_parity():
    """extract_features with a batch sharding returns the same features as
    the unsharded path (partitioned layout, same math)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    params = init_params(jax.random.PRNGKey(1))
    feature_fn = fid_lib.make_feature_fn(params)
    rng = np.random.default_rng(3)
    batches = [rng.random((8, 32, 32, 3)).astype(np.float32) for _ in range(2)]

    plain = fid_lib.extract_features(feature_fn, iter(batches), 16, 8)
    mesh = Mesh(np.array(jax.devices()), ("data",))
    sharded = fid_lib.extract_features(
        feature_fn, iter(batches), 16, 8,
        sharding=NamedSharding(mesh, P("data")),
    )
    np.testing.assert_allclose(sharded, plain, atol=2e-4)


def test_calc_inception_cli(tmp_path, monkeypatch):
    """The stats CLI end-to-end on a tiny image folder (random inception
    weights): the saved pickle has the evaluate_fid stats contract."""
    import sys

    from PIL import Image

    import calc_inception as cli

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rng = np.random.default_rng(0)
    for i in range(12):
        arr = (rng.random((40, 40, 3)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(img_dir / f"{i:03d}.png")

    out = tmp_path / "stats.pkl"
    monkeypatch.setattr(sys, "argv", [
        "calc_inception.py", "--path", str(img_dir), "--size", "32",
        "--batch", "8", "--n_samples", "8", "--save_path", str(out),
    ])
    cli.main()
    mu, cov = fid_lib.load_stats(out)
    assert mu.shape == (2048,) and cov.shape == (2048, 2048)
    assert np.isfinite(mu).all() and np.isfinite(cov).all()


@pytest.mark.slow
def test_sharded_gen_feature_parity():
    """The fused sharded FID chunk program: identical features on an
    8-device mesh and a 1-device submesh (sharding changes layout, not
    math), output actually sharded over the data axis, and batch rounded
    up to a mesh multiple."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from gan_control_tpu.models.generator import Generator

    gen = Generator(size=32, style_dim=64, n_mlp=2, channel_multiplier=0.25,
                    max_channels=32)
    g_params = gen.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        [jnp.zeros((1, 64))],
    )
    f_params = init_params(jax.random.PRNGKey(2))

    devs = np.array(jax.devices())
    mesh8 = Mesh(devs, ("data",))
    mesh1 = Mesh(devs[:1], ("data",))

    run8 = fid_lib.make_sharded_gen_feature_fn(gen, 6, 64, mesh=mesh8)
    run1 = fid_lib.make_sharded_gen_feature_fn(gen, 8, 64, mesh=mesh1)
    assert run8.batch == 8  # 6 rounded up to the mesh multiple
    assert run1.batch == 8

    # a caller-supplied mesh keeps ITS axis name (the `axis` parameter is
    # only the default for the self-built mesh)
    run_named = fid_lib.make_sharded_gen_feature_fn(
        gen, 8, 64, mesh=Mesh(devs, ("batch",))
    )
    f_named = run_named(g_params, f_params, jax.random.PRNGKey(7))
    assert f_named.shape == (8, 2048)

    rng = jax.random.PRNGKey(7)
    f8 = run8(g_params, f_params, rng)
    f1 = run1(jax.device_put(g_params, NamedSharding(mesh1, P())),
              jax.device_put(f_params, NamedSharding(mesh1, P())), rng)
    assert f8.shape == (8, 2048)
    assert f8.sharding.is_equivalent_to(NamedSharding(mesh8, P("data")), f8.ndim)
    np.testing.assert_allclose(np.asarray(f8), np.asarray(f1), atol=2e-4)

    # the evaluate_fid plumbing accepts the fused program (feature_fn=None)
    feats = fid_lib.extract_features_from_generator(
        lambda k: run8(g_params, f_params, k), None, 12, run8.batch,
        jax.random.PRNGKey(3),
    )
    assert feats.shape == (12, 2048)
    assert np.isfinite(feats).all()
