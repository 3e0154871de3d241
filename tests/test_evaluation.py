"""Evaluation-layer tests: Fréchet distance gold values, separability
statistics oracle, matrix-latent structure, tracker bookkeeping, and an
InceptionV3 feature smoke (random weights)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gan_control_tpu.evaluation.fid import compute_stats, frechet_distance
from gan_control_tpu.evaluation.generation import make_matrix_latents, to_uint8_grid
from gan_control_tpu.evaluation.separability import (
    make_paired_latents,
    separability_stats,
)
from gan_control_tpu.evaluation.tracker import Tracker


def test_frechet_distance_identical_is_zero():
    rng = np.random.default_rng(0)
    f = rng.standard_normal((500, 16))
    mu, cov = compute_stats(f)
    assert abs(frechet_distance(mu, cov, mu, cov)) < 1e-6


def test_frechet_distance_mean_shift_analytic():
    """For equal covariance, FID reduces to ||mu1 - mu2||^2."""
    rng = np.random.default_rng(1)
    f = rng.standard_normal((2000, 8))
    mu, cov = compute_stats(f)
    shift = np.full(8, 0.5)
    d = frechet_distance(mu, cov, mu + shift, cov)
    np.testing.assert_allclose(d, np.sum(shift**2), rtol=1e-6)


def test_separability_stats_oracle():
    d = np.array([[0.1, 5.0, 3.0], [4.0, 0.2, 6.0], [2.5, 7.0, 0.3]])
    st = separability_stats(d)
    np.testing.assert_allclose(st["same"], [0.1, 0.2, 0.3])
    # per-QUERY 2nd-best: min over signatures (column-min of off-diagonals;
    # reference loss_model.py:218-227 iterates qid and mins over axis 0)
    np.testing.assert_allclose(st["not_same"], [2.5, 5.0, 3.0])
    assert st["all_not_same"].shape == (6,)


def test_paired_latents_share_chunk():
    z = np.asarray(make_paired_latents(jax.random.PRNGKey(0), 8, (4, 12), style_dim=16))
    np.testing.assert_allclose(z[1::2, 4:12], z[0::2, 4:12])
    assert not np.allclose(z[1::2, :4], z[0::2, :4])


def test_matrix_latents_structure():
    s, e = 8, 16
    lat = np.asarray(
        make_matrix_latents(jax.random.PRNGKey(0), ids_in_row=3, pose_in_col=2,
                            style_dim=24, same_chunk=(s, e))
    )
    m = lat.reshape(2, 3, 24)
    # rows share the group chunk
    np.testing.assert_allclose(m[0, 0, s:e], m[0, 1, s:e])
    np.testing.assert_allclose(m[1, 0, s:e], m[1, 2, s:e])
    # columns share the complement
    np.testing.assert_allclose(m[0, 1, :s], m[1, 1, :s])
    np.testing.assert_allclose(m[0, 2, e:], m[1, 2, e:])


def test_uint8_grid_shape():
    imgs = np.random.default_rng(0).random((6, 8, 8, 3)).astype(np.float32)
    grid = to_uint8_grid(imgs, nrow=3)
    assert grid.dtype == np.uint8
    assert grid.shape == (2 * 10 + 2, 3 * 10 + 2, 3)


def test_tracker_fid_and_stats(tmp_path):
    t = Tracker(save_dir=tmp_path)
    t.mark_start_iter()
    t.mark_start_iter()
    assert t.register_fid(100, 30.0) is True
    assert t.register_fid(200, 25.0) is True
    rec = t.write_stats(200, extra={"g_loss": 1.5})
    assert rec["fid"] == 25.0 and rec["best_fid"] == 25.0
    assert t.register_fid(300, 40.0) is False
    assert (tmp_path / "metrics.jsonl").exists()


@pytest.mark.slow
def test_inception_feature_shape():
    from gan_control_tpu.evaluation.inception import InceptionV3Features, init_params

    params = init_params(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 299, 299, 3))
    feats = InceptionV3Features().apply(params, x)
    assert feats.shape == (1, 2048)
    assert np.all(np.isfinite(np.asarray(feats)))


def test_closest_impostor_pairs():
    """Bucket pairs = the k not-same pairs with the SMALLEST 2nd-best
    distance (reference get_kmin over pids_2nd_best_pairs_df,
    tracker.py:303-311): closest impostors, (signature, query) rows."""
    from gan_control_tpu.evaluation.separability import closest_impostor_pairs

    d = np.array([
        [0.1, 9.0, 0.4, 9.0],
        [0.2, 0.1, 9.0, 9.0],
        [9.0, 9.0, 0.1, 1.5],
        [9.0, 9.0, 9.0, 0.1],
    ])
    pairs = closest_impostor_pairs(d, k=2)
    # query 0's closest impostor is signature 1 (0.2); query 2's is
    # signature 0 (0.4)
    np.testing.assert_array_equal(pairs, [[1, 0], [0, 2]])


def test_disentanglement_scores_synthetic():
    """DS on a transparent 'generator' whose image pixels ARE the latent:
    varying group i moves attribute i's spread to ~the free-sampling
    baseline (normalized ~1) while frozen groups read exactly 0 (reference
    extract_recon_3d/disentanglement_score.py semantics)."""
    from gan_control_tpu.evaluation.disentanglement import (
        all_vs_all_mean_distance,
        disentanglement_scores,
    )

    style_dim = 8
    groups = {"a": (0, 4), "b": (4, 8)}

    def generate_fn(z):
        return jnp.tile(z[:, None, None, :], (1, 2, 2, 1))

    attribute_fns = {
        "a": lambda imgs: np.asarray(imgs[:, 0, 0, 0:4]),
        "b": lambda imgs: np.asarray(imgs[:, 0, 0, 4:8]),
    }
    out = disentanglement_scores(
        generate_fn, attribute_fns, groups, jax.random.PRNGKey(0),
        num_sets=3, set_size=8, style_dim=style_dim,
    )
    for varied in groups:
        for attr in groups:
            score = out[varied][attr]
            if attr == varied:
                assert 0.5 < score < 2.0, (varied, attr, score)
            else:
                assert score < 1e-6, (varied, attr, score)

    # the distance helper against a hand-computed 3-point oracle
    vecs = np.array([[0.0, 0.0], [3.0, 4.0], [0.0, 0.0]])
    want = (5.0 + 0.0 + 5.0) / 3.0
    assert abs(all_vs_all_mean_distance(vecs) - want) < 1e-12
