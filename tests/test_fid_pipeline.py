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
