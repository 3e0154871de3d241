"""The projector optimization loop actually inverts: project() recovers a
target produced by a known (latent, noises) pair on a toy synthesizer,
reducing perceptual+MSE loss monotonically-ish over the run (reference
projection/projection.py project loop)."""

import numpy as np

import jax
import jax.numpy as jnp

from gan_control_tpu.projection.projection import (
    get_lr,
    get_pca_groups,
    noise_regularize,
    project,
)

H = 16
NOISE_SHAPES = [(1, 8, 8, 1), (1, 16, 16, 1)]


def _synth(latent, noises):
    """Toy 'generator': latent IS the image; noises add octave detail."""
    img = jnp.tanh(latent).reshape(1, H, H, 3)
    n0 = jnp.repeat(jnp.repeat(noises[0], 2, axis=1), 2, axis=2)
    return img + 0.05 * n0 + 0.05 * noises[1]


def _lpips_stub(a, b):
    """Per-sample 'perceptual' distance: pooled-feature MSE."""
    fa = a.reshape(a.shape[0], 4, 4, 4, 4, 3).mean((2, 4))
    fb = b.reshape(b.shape[0], 4, 4, 4, 4, 3).mean((2, 4))
    return jnp.mean(jnp.square(fa - fb), axis=(1, 2, 3))


def test_project_reduces_loss_and_reconstructs():
    key = jax.random.PRNGKey(0)
    k_lat, k_n, k_run = jax.random.split(key, 3)
    true_latent = jax.random.normal(k_lat, (1, H * H * 3)) * 0.5
    true_noises = [
        jax.random.normal(jax.random.fold_in(k_n, i), s)
        for i, s in enumerate(NOISE_SHAPES)
    ]
    target = _synth(true_latent, true_noises)

    latent, noises, history = project(
        _synth, _lpips_stub, target,
        latent_init=jnp.zeros((1, H * H * 3)),
        noise_shapes=NOISE_SHAPES,
        rng=k_run,
        steps=120,
        initial_lr=0.05,
        noise_strength_base=0.01,
        noise_regularize_w=1e2,
        mse_weight=1.0,
    )
    assert len(history) >= 2
    first, last = history[0], history[-1]
    assert np.isfinite(last["loss"])
    assert last["loss"] < first["loss"] * 0.5, (first, last)
    # the reconstruction is close to the target image
    recon = np.asarray(_synth(latent, noises))
    mse = float(np.mean(np.square(recon - np.asarray(target))))
    assert mse < 0.02, mse


def test_noise_regularize_penalizes_correlation():
    """Structured (shift-correlated) noise scores higher than iid noise."""
    k = jax.random.PRNGKey(3)
    iid = jax.random.normal(k, (1, 16, 16, 1))
    structured = jnp.tile(jnp.ones((1, 16, 1, 1)), (1, 1, 16, 1))
    assert float(noise_regularize([structured])) > float(noise_regularize([iid]))


def test_get_lr_ramp_shape():
    assert get_lr(0.0, 0.1) == 0.0                 # warm-up starts at zero
    assert abs(get_lr(0.5, 0.1) - 0.1) < 1e-9      # plateau at initial_lr
    assert get_lr(1.0, 0.1) < 1e-9                 # cosine ramp-down to zero


def test_get_pca_groups_variance_cover():
    """Per-group PCA keeps the components covering >=50% variance; a group
    with one dominant direction needs exactly one component."""
    rng = np.random.default_rng(0)
    n, d = 512, 8

    def map_fn(z):
        w = np.asarray(z)[:, :d].astype(np.float32)
        w[:, 0] *= 30.0  # dominant direction in group 'a'
        return jnp.asarray(w)

    groups = {"a": (0, 4), "b": (4, 8)}
    out = get_pca_groups(
        map_fn, groups, jnp.zeros((d,)), jax.random.PRNGKey(1),
        n_mean_latent=n, style_dim=d,
    )
    assert out["a"].shape == (1, 4)   # one component covers the variance
    assert out["b"].shape[1] == 4 and out["b"].shape[0] >= 1
