"""Discriminator shape / structure tests (reference models/gan_model.py:925-1016)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gan_control_tpu.models.discriminator import Discriminator
from gan_control_tpu.models.blocks import minibatch_stddev


def test_discriminator_shapes_32():
    d = Discriminator(size=32, max_channels=64)
    x = jnp.zeros((4, 32, 32, 3))
    params = d.init(jax.random.PRNGKey(0), x)
    adv, ver = d.apply(params, x)
    assert adv.shape == (4, 1)
    assert ver is None


def test_discriminator_verification_branch():
    d = Discriminator(size=32, verification=True, max_channels=64)
    x = jnp.zeros((4, 32, 32, 3))
    params = d.init(jax.random.PRNGKey(0), x)
    adv, ver = d.apply(params, x)
    assert adv.shape == (4, 1)
    assert ver.shape == (4, 128)
    # split at size/4 = 8: blocks below res 8 (i.e. res 4) are duplicated
    names = set(params["params"].keys())
    assert any(n.startswith("adv_block") for n in names)
    assert any(n.startswith("ver_block") for n in names)


def test_minibatch_stddev_matches_torch_semantics():
    """Oracle: the reference's grouped unbiased=False stddev statistic
    (models/gan_model.py:1003-1012), transcribed to numpy in NHWC."""
    rng = np.random.default_rng(0)
    b, h, w, c = 8, 4, 4, 6
    x = rng.normal(size=(b, h, w, c)).astype(np.float32)
    g = 4
    grouped = x.reshape(g, b // g, h, w, 1, c)
    var = grouped.var(axis=0)
    std = np.sqrt(var + 1e-8)
    stat = std.mean(axis=(1, 2, 4))  # [b//g, 1]
    want = np.tile(stat[:, None, None, :], (g, h, w, 1))

    got = np.asarray(minibatch_stddev(jnp.asarray(x), group_size=4))
    np.testing.assert_allclose(got[..., -1:], want, rtol=1e-5)
    np.testing.assert_allclose(got[..., :-1], x, rtol=1e-6)


def test_verification_wired_from_config():
    """build_discriminator reads model_config.verification* (reference
    Discriminator ctor args, gan_model.py:925-951) and the branch trains:
    grads flow to both the adversarial head and the verification tail."""
    import jax
    import numpy as np

    from gan_control_tpu.models.factory import build_discriminator

    cfg = {
        "model_config": {
            "size": 32,
            "img_channels": 3,
            "max_channels": 64,
            "channel_multiplier": 0.5,
            "verification": True,
            "verification_res_split": 8,
            "verification_dim": 16,
        }
    }
    d = build_discriminator(cfg)
    assert d.verification and d.verification_res_split == 8
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
    params = d.init(jax.random.PRNGKey(1), x)
    adv, ver = d.apply(params, x)
    assert adv.shape == (2, 1)
    assert ver.shape == (2, 16)

    def loss(p):
        a, v = d.apply(p, x)
        return jnp.mean(a) + jnp.mean(jnp.square(v))

    grads = jax.grad(loss)(params)
    flat = jax.tree_util.tree_leaves_with_path(grads)
    ver_grads = [np.abs(np.asarray(g)).sum() for path, g in flat
                 if any("ver_" in str(p) for p in path)]
    adv_grads = [np.abs(np.asarray(g)).sum() for path, g in flat
                 if any("adv_" in str(p) for p in path)]
    assert ver_grads and sum(ver_grads) > 0
    assert adv_grads and sum(adv_grads) > 0
