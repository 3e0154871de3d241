"""Generator mode coverage: '896' noise-shape ladder, VAE and marge_fc
mappings, noise modes, truncation, explicit style mixing."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gan_control_tpu.models.generator import Generator, channel_table


def test_896_noise_shapes_match_reference_formula():
    """reference make_noise (gan_model.py:683-696): 4x4 first, then per
    level i (3..log_size), two layers of size 2^i, EXCEPT in '896' mode
    where i>4 (or i==4 second layer) uses 14*2^(i-4)."""
    g = Generator(size=1024, model_mode="896", style_dim=64, n_mlp=2)
    shapes = [s[1] for s in g.noise_shapes(1)]
    want = [4]
    for i in range(3, 11):
        for inter in range(2):
            if i > 4 or (i == 4 and inter > 0):
                want.append(14 * 2 ** (i - 4))
            else:
                want.append(2**i)
    assert shapes == want
    assert shapes[-1] == 896  # the 896-px output ladder


def test_channel_table_reference_values():
    t = channel_table(2.0)
    assert t[4] == 512 and t[64] == 512 and t[128] == 256
    assert t[512] == 64 and t[1024] == 32 and t[1344] == 32


@pytest.mark.parametrize("kind", ["vae", "marge"])
def test_alternative_mappings_forward(kind):
    fc_groups = (("id", 32), ("other", 32))
    kw = dict(size=16, style_dim=64, n_mlp=2, max_channels=32)
    if kind == "vae":
        g = Generator(vae=True, bottleneck_size=16, **kw)
    else:
        g = Generator(marge_fc=True, fc_groups=fc_groups, **kw)
    z = jax.random.normal(jax.random.PRNGKey(0), (2, 64))
    p = g.init({"params": jax.random.PRNGKey(1), "noise": jax.random.PRNGKey(2)}, [z])
    img, lat = g.apply(p, [z], return_latents=True,
                       rngs={"noise": jax.random.PRNGKey(3)})
    assert img.shape == (2, 16, 16, 3)
    assert lat.shape == (2, g.n_latent, 64)


def test_truncation_pulls_toward_mean():
    g = Generator(size=16, style_dim=64, n_mlp=2, max_channels=32)
    z = jax.random.normal(jax.random.PRNGKey(0), (2, 64))
    p = g.init({"params": jax.random.PRNGKey(1), "noise": jax.random.PRNGKey(2)}, [z])
    w = g.apply(p, z, method="map_latent")
    mean_w = jnp.mean(w, axis=0, keepdims=True)
    _, lat_full = g.apply(p, [z], return_latents=True, truncation=1.0,
                          truncation_latent=mean_w,
                          rngs={"noise": jax.random.PRNGKey(3)})
    _, lat_trunc = g.apply(p, [z], return_latents=True, truncation=0.0,
                           truncation_latent=mean_w,
                           rngs={"noise": jax.random.PRNGKey(3)})
    # truncation=0 -> w collapses to the mean
    np.testing.assert_allclose(
        np.asarray(lat_trunc), np.broadcast_to(np.asarray(mean_w)[:, None], lat_trunc.shape),
        rtol=1e-5,
    )
    assert not np.allclose(np.asarray(lat_full), np.asarray(lat_trunc))


def test_explicit_inject_index_mixing():
    g = Generator(size=16, style_dim=64, n_mlp=2, max_channels=32)
    z1 = jax.random.normal(jax.random.PRNGKey(0), (2, 64))
    z2 = jax.random.normal(jax.random.PRNGKey(1), (2, 64))
    p = g.init({"params": jax.random.PRNGKey(2), "noise": jax.random.PRNGKey(3)}, [z1])
    w1 = g.apply(p, z1, method="map_latent")
    w2 = g.apply(p, z2, method="map_latent")
    _, lat = g.apply(p, [z1, z2], return_latents=True, inject_index=2,
                     rngs={"noise": jax.random.PRNGKey(4)})
    np.testing.assert_allclose(np.asarray(lat[:, 0]), np.asarray(w1), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(lat[:, 1]), np.asarray(w1), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(lat[:, 2]), np.asarray(w2), rtol=1e-5)


@pytest.mark.slow
def test_896_mode_forward():
    """Actual forward at model_mode='896' (reference gan_model.py:552-563,
    691-692): a size-1024 ladder whose res-16 conv shrinks 16->14, giving
    a 896x896 output; explicit make_noise-shaped injection noise must be
    accepted. Discriminator consumes the 896 image via its fractional
    overwrite_padding blocks."""
    import jax

    from gan_control_tpu.models.discriminator import Discriminator

    g = Generator(size=1024, model_mode="896", style_dim=32, n_mlp=1,
                  channel_multiplier=0.25, max_channels=8)
    z = jax.random.normal(jax.random.PRNGKey(0), (1, 32))
    params = g.init({"params": jax.random.PRNGKey(1),
                     "noise": jax.random.PRNGKey(2)}, [z])
    noise = [
        jax.random.normal(jax.random.fold_in(jax.random.PRNGKey(3), i), s)
        for i, s in enumerate(g.noise_shapes(1))
    ]
    img, latent = g.apply(params, [z], noise=noise, return_latents=True)
    assert img.shape == (1, 896, 896, 3), img.shape
    assert np.isfinite(np.asarray(img)).all()
    assert latent.shape == (1, g.n_latent, 32)

    d = Discriminator(size=1024, model_mode="896", channel_multiplier=0.25,
                      max_channels=8)
    d_params = d.init(jax.random.PRNGKey(4), img)
    logit, _ = d.apply(d_params, img)
    assert logit.shape == (1, 1)
    assert np.isfinite(np.asarray(logit)).all()
