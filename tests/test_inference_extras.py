"""Wiring tests for the inference extras: ControlExtractor (the shared
predictor battery used by make_attributes_df / real-photo control
extraction, reference inference_class.py:274-303) and per-group latent
interpolation + gif export (reference inference_class.py:125-203)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

STYLE = 16


# ---------------------------------------------------------------------------
# ControlExtractor
# ---------------------------------------------------------------------------


def test_control_extractor_battery():
    """Enabled predictor blocks -> DataFrame-named columns with the right
    shapes; disabled/absent blocks are skipped."""
    from gan_control_tpu.inference.extract_controls import ControlExtractor

    tc = {
        "orientation_loss": {"enabled": True},
        "embedding_loss": {"enabled": True, "center_crop": None},
        "age_loss": {"enabled": False},
    }
    ex = ControlExtractor(tc)
    assert set(ex.mods) == {"orientation_loss", "embedding_loss"}

    imgs = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 64, 3)) * 0.3
    out = ex.extract(imgs)
    assert set(out) == {"orientation", "arcface_emb"}
    assert out["orientation"].shape == (2, 3)
    assert out["arcface_emb"].shape == (2, 512)
    assert np.all(np.isfinite(out["orientation"]))
    assert np.all(np.isfinite(out["arcface_emb"]))


def test_control_extractor_align_fn_routing():
    """align_fn is applied to the embedding (ArcFace) input but NOT the
    plain per-attribute predictors (reference runs Hopenet/DEX on the raw
    generator output and the id/3D path on aligned crops)."""
    from gan_control_tpu.inference.extract_controls import ControlExtractor

    calls = []

    def align_fn(x):
        calls.append(x.shape)
        return x

    tc = {"embedding_loss": {"enabled": True, "center_crop": None}}
    ex = ControlExtractor(tc, align_fn=align_fn)
    imgs = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 64, 3)) * 0.3
    out = ex.extract(imgs)
    assert len(calls) == 1
    assert "arcface_emb" in out


# ---------------------------------------------------------------------------
# interpolate_by_group
# ---------------------------------------------------------------------------


class _LatentImageModel:
    """Stub with the generator's apply signature whose 'image' IS the
    latent (tiled spatially), so frame pixels reveal exactly which latent
    dims moved."""

    def apply(self, params, zs, rngs=None):
        z = zs[0]
        img = jnp.tile(z[:, None, None, :], (1, 2, 2, 1)) * 0.2
        return img, None


def test_interpolate_by_group_freezes_exactly_the_group():
    from gan_control_tpu.inference.interpolation import interpolate_by_group

    s, e = 4, 8
    freeze_grp, freeze_rest = interpolate_by_group(
        _LatentImageModel(), {}, (s, e), jax.random.PRNGKey(0),
        batch=2, num_of_intermediate_latents=2, pics_per_interpolation=4,
        interpolation="slerp", style_dim=STYLE,
    )
    assert len(freeze_grp) == len(freeze_rest) == 8
    fg = np.stack(freeze_grp)    # [F, B, 2, 2, STYLE]
    fr = np.stack(freeze_rest)

    # stream 1: the group slice is pinned to the base latent on every frame
    assert np.ptp(fg[..., s:e], axis=0).max() < 1e-6
    # ...while everything else interpolates (moves across frames)
    assert np.ptp(fg[..., :s], axis=0).max() > 1e-3
    # stream 2: ONLY the group moves; the rest is pinned
    assert np.ptp(fr[..., s:e], axis=0).max() > 1e-3
    other = np.concatenate([fr[..., :s], fr[..., e:]], axis=-1)
    assert np.ptp(other, axis=0).max() < 1e-6


@pytest.mark.parametrize("kind", ["linear", "sqrt"])
def test_interpolation_kinds_hit_endpoints(kind):
    from gan_control_tpu.inference.interpolation import _interp

    a = jnp.asarray(np.random.default_rng(0).standard_normal((2, 4)), jnp.float32)
    b = jnp.asarray(np.random.default_rng(1).standard_normal((2, 4)), jnp.float32)
    np.testing.assert_allclose(np.asarray(_interp(kind, 0.0, a, b)), np.asarray(a), atol=1e-6)
    np.testing.assert_allclose(np.asarray(_interp(kind, 1.0, a, b)), np.asarray(b), atol=1e-6)


def test_save_gif_roundtrip(tmp_path):
    """interpolate_by_group frames -> animated gif with one frame per step
    (the reference shells out to ImageMagick; we write via PIL)."""
    from PIL import Image

    from gan_control_tpu.inference.interpolation import (
        interpolate_by_group, save_gif,
    )
    from gan_control_tpu.models.factory import build_generator, build_group_spec

    config = {
        "model_config": {
            "vanilla": True, "img_channels": 3, "split_fc": False,
            "marge_fc": False, "latent_size": STYLE, "size": 8,
            "n_mlp": 1, "channel_multiplier": 0.25, "max_channels": 16,
            "g_noise_mode": "normal",
        },
        "training_config": {},
    }
    gen = build_generator(config, build_group_spec(config))
    z = jnp.zeros((1, STYLE))
    params = gen.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}, [z]
    )
    frames, _ = interpolate_by_group(
        gen, params, (0, 8), jax.random.PRNGKey(2),
        batch=2, num_of_intermediate_latents=1, pics_per_interpolation=3,
        style_dim=STYLE,
    )
    path = tmp_path / "interp.gif"
    save_gif(frames, path, nrow=2, duration_ms=100)
    with Image.open(path) as im:
        assert im.n_frames == 3
