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


def _tiny_gen(**kw):
    gen = Generator(size=16, style_dim=32, n_mlp=2, max_channels=32, **kw)
    z = jax.random.normal(jax.random.PRNGKey(0), (2, 32))
    params = gen.init(
        {"params": jax.random.PRNGKey(1), "noise": jax.random.PRNGKey(2)}, [z]
    )
    return gen, params, z


def test_zeros_noise_mode_only_on_upsample_convs():
    """noise_mode applies to conv1 and the UPSAMPLE convs only; the second
    conv of each pair keeps the default 'normal' injection (reference
    gan_model.py:567, 592-599 pass noise_mode, :606-610 do not)."""
    gen, params, z = _tiny_gen(noise_mode="zeros")
    bound = gen.bind(params, rngs={"noise": jax.random.PRNGKey(3)})
    modes = [c.noise_mode for c in bound.convs]
    assert modes[0::2] == ["zeros"] * (len(modes) // 2)
    assert modes[1::2] == ["normal"] * (len(modes) // 2)
    # the zeros-mode injections still register their weight param (the
    # reference constructs nn.Parameter unconditionally, :1024)
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    noise_params = [p for p, _ in flat if any("noise" in str(k) for k in p)]
    assert len(noise_params) == len(modes) + 1  # + conv1


def test_mixing_without_index_randomizes_crossover():
    """Two styles with inject_index=None draw a random crossover per call
    (reference random.randint, gan_model.py:763-764) — fixed injection
    noise isolates the crossover as the only rng-dependent piece."""
    gen, params, z = _tiny_gen()
    z2 = jax.random.normal(jax.random.PRNGKey(9), (2, 32))
    noise = [jnp.zeros(s) for s in gen.noise_shapes(2)]
    imgs = [
        np.asarray(gen.apply(params, [z, z2], noise=noise,
                             rngs={"noise": jax.random.PRNGKey(k)})[0])
        for k in range(6)
    ]
    assert any(not np.allclose(imgs[0], im) for im in imgs[1:]), \
        "crossover never varied"


def test_truncation_without_latent_raises():
    gen, params, z = _tiny_gen()
    with pytest.raises(ValueError, match="truncation_latent"):
        gen.apply(params, [z], truncation=0.7,
                  rngs={"noise": jax.random.PRNGKey(3)})


def test_vae_exposes_mu_logvar():
    """VAE mode surfaces mu/logvar for the KL term (reference stashes
    self.mu/self.logvar, gan_model.py:734-735)."""
    gen, params, z = _tiny_gen(vae=True)
    w, mu, logvar = gen.apply(params, z, method=type(gen).map_latent_vae,
                              rngs={"noise": jax.random.PRNGKey(5)})
    assert w.shape == (2, 32) and mu.shape == logvar.shape
    _, inter = gen.apply(params, [z], rngs={"noise": jax.random.PRNGKey(3)},
                         mutable=["intermediates"])
    leaves = {str(k): v for k, v in
              jax.tree_util.tree_flatten_with_path(inter)[0]}
    assert any("vae_mu" in k for k in leaves)
    assert any("vae_logvar" in k for k in leaves)
