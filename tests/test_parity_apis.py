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


def test_gen_matrix_images(tiny_gen, monkeypatch):
    from gan_control_tpu.evaluation import generation

    gen, params = tiny_gen
    # pin the routing into make_matrix_latents (whose row/column latent
    # sharing is itself pinned by test_evaluation.test_matrix_latents_structure)
    seen = {}
    real = generation.make_matrix_latents

    def spy(rng, ids_in_row, pose_in_col, style_dim, same_chunk):
        seen.update(ids_in_row=ids_in_row, pose_in_col=pose_in_col,
                    style_dim=style_dim, same_chunk=same_chunk)
        return real(rng, ids_in_row, pose_in_col, style_dim, same_chunk)

    monkeypatch.setattr(generation, "make_matrix_latents", spy)
    imgs = np.asarray(
        generation.gen_matrix_images(
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
    assert seen == {"ids_in_row": 2, "pose_in_col": 3, "style_dim": 64,
                    "same_chunk": (32, 64)}


class _StubPredictor:
    """Module-shaped stub with the predictor interface the calc_* wrappers
    consume (real predictors are forward-tested in test_predictors.py; these
    wrappers are host-side plumbing, so a stub keeps the 1-CPU suite fast)."""

    def __init__(self, ret):
        self.ret = ret
        self.got = None

    def predict(self, model, params, images):
        assert isinstance(images, jax.Array)  # wrapper must convert to jax
        self.got = images
        return self.ret


@pytest.mark.parametrize(
    "fn_name,ret_shape",
    [
        ("calc_orientation_from_tensor_images", (2, 3)),
        ("calc_age_from_tensor_images", (2,)),
        ("calc_expression_from_tensor_images", (2,)),
        ("calc_hair_color_from_images", (2, 3)),
    ],
)
def test_calc_wrappers_passthrough(fn_name, ret_shape):
    from gan_control_tpu.evaluation import attribute_evals

    stub = _StubPredictor(jnp.arange(int(np.prod(ret_shape)),
                                     dtype=jnp.float32).reshape(ret_shape))
    images = np.zeros((2, 8, 8, 3), np.float32)  # numpy in, jax inside
    out = getattr(attribute_evals, fn_name)(stub, None, None, images)
    assert isinstance(out, np.ndarray) and out.shape == ret_shape
    np.testing.assert_array_equal(out, np.asarray(stub.ret))
    assert stub.got.shape == images.shape


def test_calc_recon3d_from_tensor_images():
    from gan_control_tpu.evaluation.attribute_evals import (
        calc_recon3d_from_tensor_images,
    )

    # real face3dmm: the 7-way coefficient split is this wrapper's contract
    mod = importlib.import_module("gan_control_tpu.losses.predictors.face3dmm")
    model = mod.make_model({"center_crop": None})
    params = mod.init_params(model, jax.random.PRNGKey(0))
    images = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 64, 3)) * 0.3
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


def _upfirdn_oracle_xy(x, kernel, up_xy, down_xy, pad_xyxy):
    """Per-axis textbook upfirdn (zero-stuff, pad, flipped-kernel correlate,
    decimate) on numpy; x axis = W, y axis = H; non-negative pads only."""
    up_x, up_y = up_xy
    down_x, down_y = down_xy
    px0, px1, py0, py1 = pad_xyxy
    n, h, w, c = x.shape
    kh, kw = kernel.shape
    hs, ws = h * up_y, w * up_x
    stuffed = np.zeros((n, hs, ws, c), np.float64)
    stuffed[:, ::up_y, ::up_x] = x
    padded = np.pad(stuffed, ((0, 0), (py0, py1), (px0, px1), (0, 0)))
    kf = kernel[::-1, ::-1]
    oh, ow = padded.shape[1] - kh + 1, padded.shape[2] - kw + 1
    out = np.zeros((n, oh, ow, c), np.float64)
    for i in range(oh):
        for j in range(ow):
            out[:, i, j, :] = np.einsum(
                "nhwc,hw->nc", padded[:, i : i + kh, j : j + kw, :], kf
            )
    return out[:, ::down_y, ::down_x, :]


def test_upfirdn2d_native_asymmetric_axes():
    """Asymmetric per-axis factors/pads + non-square input + non-symmetric
    kernel: pins the (up_x, up_y) / (pad_x0, pad_x1, pad_y0, pad_y1) axis
    ordering of the full reference signature (pytorch_upfirdn2d.py:9)."""
    from gan_control_tpu.ops.upfirdn2d import upfirdn2d, upfirdn2d_native

    x = np.asarray(jax.random.normal(jax.random.PRNGKey(0), (2, 5, 7, 3)),
                   np.float64)
    k = np.array([[1.0, 2.0, 1.0], [3.0, 4.0, 5.0]]) / 16.0
    up, down, pad = (2, 1), (1, 2), (1, 0, 2, 1)
    want = _upfirdn_oracle_xy(x, k, up, down, pad)
    got = upfirdn2d_native(jnp.asarray(x, jnp.float32), jnp.asarray(k),
                           up=up, down=down, pad=pad)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)

    # and the simple signature is the symmetric special case of the full one
    simple = upfirdn2d(jnp.asarray(x, jnp.float32), jnp.asarray(k),
                       up=2, down=1, pad=(1, 0))
    full = upfirdn2d_native(jnp.asarray(x, jnp.float32), jnp.asarray(k),
                            up=(2, 2), down=(1, 1), pad=(1, 0, 1, 0))
    np.testing.assert_allclose(np.asarray(simple), np.asarray(full), atol=1e-6)
