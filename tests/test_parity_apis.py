"""Tests for the standalone reference-parity evaluation/util APIs that the
training loop does not route through (it uses its own jitted equivalents):
gen_grid_images / gen_matrix_images (reference evaluation/generation.py),
the calc_*_from_tensor_images wrappers (reference evaluation/orientation.py
:37-42, age.py:18-23, expression.py:43-48, hair.py:20-22, recon_3d.py),
annotate_images / save_gif_from_grids / get_kmin (reference
utils/pil_images_utils.py, utils/pandas_utils.py), plot_graph /
plot_error_bar (reference utils/ploting_utils.py,
evaluation/gan_evaluation/error_bar_plot.py) and the full-signature
upfirdn2d_native (reference models/pytorch_upfirdn2d.py:109-141)."""

import importlib

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gan_control_tpu.models.generator import Generator


@pytest.fixture(scope="module")
def tiny_gen():
    gen = Generator(size=16, style_dim=64, n_mlp=2, max_channels=32)
    z = jax.random.normal(jax.random.PRNGKey(0), (1, 64))
    params = gen.init(
        {"params": jax.random.PRNGKey(1), "noise": jax.random.PRNGKey(2)}, [z]
    )
    return gen, params


def test_gen_grid_images(tiny_gen):
    from gan_control_tpu.evaluation.generation import gen_grid_images

    gen, params = tiny_gen
    latent = jax.random.normal(jax.random.PRNGKey(3), (4, 64))
    imgs = np.asarray(gen_grid_images(gen, params, latent))
    assert imgs.shape == (4, 16, 16, 3)
    assert imgs.min() >= 0.0 and imgs.max() <= 1.0
    # fixed latents + fixed rng => deterministic grid
    again = np.asarray(gen_grid_images(gen, params, latent))
    np.testing.assert_array_equal(imgs, again)


def test_gen_matrix_images(tiny_gen):
    from gan_control_tpu.evaluation.generation import gen_matrix_images

    gen, params = tiny_gen
    imgs = np.asarray(
        gen_matrix_images(
            gen,
            params,
            jax.random.PRNGKey(4),
            ids_in_row=2,
            pose_in_col=3,
            same_chunk=(32, 64),
            style_dim=64,
        )
    )
    assert imgs.shape == (6, 16, 16, 3)
    assert imgs.min() >= 0.0 and imgs.max() <= 1.0


def _make_predictor(name, config, img_size):
    mod = importlib.import_module(f"gan_control_tpu.losses.predictors.{name}")
    model = mod.make_model(config)
    params = mod.init_params(model, jax.random.PRNGKey(0))
    images = (
        jax.random.normal(jax.random.PRNGKey(1), (2, img_size, img_size, 3)) * 0.3
    )
    return mod, model, params, images


def test_calc_orientation_from_tensor_images():
    from gan_control_tpu.evaluation.attribute_evals import (
        calc_orientation_from_tensor_images,
    )

    mod, model, params, images = _make_predictor("hopenet", {}, 64)
    ypr = calc_orientation_from_tensor_images(mod, model, params, images)
    assert isinstance(ypr, np.ndarray) and ypr.shape == (2, 3)
    assert np.all(np.abs(ypr) <= 99.0)


def test_calc_age_from_tensor_images():
    from gan_control_tpu.evaluation.attribute_evals import (
        calc_age_from_tensor_images,
    )

    mod, model, params, images = _make_predictor("dex_age", {"center_crop": None}, 64)
    age = calc_age_from_tensor_images(mod, model, params, images)
    assert isinstance(age, np.ndarray) and age.shape == (2,)
    assert np.all((age >= 0) & (age <= 100))


def test_calc_expression_from_tensor_images():
    from gan_control_tpu.evaluation.attribute_evals import (
        calc_expression_from_tensor_images,
    )

    mod, model, params, images = _make_predictor("esr9", {"center_crop": None}, 96)
    cls = calc_expression_from_tensor_images(mod, model, params, images)
    assert isinstance(cls, np.ndarray) and cls.shape == (2,)
    assert np.all((cls >= 0) & (cls < 8))


def test_calc_hair_color_from_images():
    from gan_control_tpu.evaluation.attribute_evals import (
        calc_hair_color_from_images,
    )

    mod, model, params, images = _make_predictor("hair_pspnet", {}, 64)
    rgb = calc_hair_color_from_images(mod, model, params, images)
    assert isinstance(rgb, np.ndarray) and rgb.shape == (2, 3)


def test_calc_recon3d_from_tensor_images():
    from gan_control_tpu.evaluation.attribute_evals import (
        calc_recon3d_from_tensor_images,
    )

    mod, model, params, images = _make_predictor("face3dmm", {"center_crop": None}, 64)
    coeffs = calc_recon3d_from_tensor_images(mod, model, params, images)
    # 3DMM coefficient split (reference recon_3d.py / face3dmm widths)
    widths = {"id": 80, "ex": 64, "tex": 80, "angles": 3, "gamma": 27, "xy": 2, "z": 1}
    assert set(coeffs) == set(widths)
    for name, w in widths.items():
        assert coeffs[name].shape == (2, w), (name, coeffs[name].shape)


def test_annotate_images_overlays_text():
    from gan_control_tpu.utils.image_utils import annotate_images

    imgs = np.zeros((3, 32, 32, 3), np.float32)
    out = annotate_images(imgs, ["a", "b", "c"])
    assert out.shape == imgs.shape
    assert out.min() >= 0.0 and out.max() <= 1.0
    assert out.max() > 0.0  # the yellow text actually landed on the pixels


def test_save_gif_from_grids(tmp_path):
    from PIL import Image

    from gan_control_tpu.utils.image_utils import save_gif_from_grids

    frames = [np.full((4, 8, 8, 3), v, np.float32) for v in (0.0, 0.5, 1.0)]
    path = tmp_path / "anim.gif"
    save_gif_from_grids(frames, path, nrow=2)
    with Image.open(path) as im:
        assert im.format == "GIF"
        assert getattr(im, "n_frames", 1) == 3


def test_get_kmin():
    from gan_control_tpu.utils.image_utils import get_kmin

    values = np.array([5.0, 1.0, 4.0, 0.5, 3.0])
    idx, vals = get_kmin(values, 3)
    np.testing.assert_array_equal(idx, [3, 1, 4])
    np.testing.assert_array_equal(vals, [0.5, 1.0, 3.0])


def test_plot_graph_and_error_bar(tmp_path):
    from gan_control_tpu.utils.plotting import plot_error_bar, plot_graph

    g = plot_graph([3.0, 2.0, 2.5], title="fid", ylabel="fid",
                   save_path=tmp_path / "curve.png")
    e = plot_error_bar([1.0, 2.0], [0.1, 0.2], ["a", "b"], title="sep",
                       save_path=tmp_path / "err.png")
    for p in (g, e):
        assert p.exists() and p.stat().st_size > 0


def test_upfirdn2d_native_matches_simple_signature():
    from gan_control_tpu.ops.upfirdn2d import upfirdn2d, upfirdn2d_native

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 3))
    k = jnp.array([[1.0, 2.0], [2.0, 4.0]]) / 9.0
    simple = upfirdn2d(x, k, up=2, down=1, pad=(1, 0))
    full = upfirdn2d_native(x, k, up=(2, 2), down=(1, 1), pad=(1, 0, 1, 0))
    np.testing.assert_allclose(np.asarray(simple), np.asarray(full), atol=1e-6)
