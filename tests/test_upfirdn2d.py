"""Gold-value tests for the XLA upfirdn2d against an independent numpy oracle.

The oracle implements the textbook definition directly (explicit zero-stuff,
pad/crop, flipped-kernel correlation, decimation) with plain numpy loops —
written from the upfirdn spec, not from any framework code.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from gan_control_tpu.ops import upfirdn2d, make_kernel, upsample_2x, downsample_2x, blur


def upfirdn2d_oracle(x_nhwc, kernel, up, down, pad0, pad1):
    """Direct-definition upfirdn on NHWC numpy arrays (slow, tiny inputs only)."""
    n, h, w, c = x_nhwc.shape
    kh, kw = kernel.shape

    # 1. zero-stuff: each sample followed by (up-1) zeros -> length h*up
    hs, ws = h * up, w * up
    stuffed = np.zeros((n, hs, ws, c), dtype=np.float64)
    stuffed[:, ::up, ::up, :] = x_nhwc

    # 2. pad (negative = crop)
    hp = hs + pad0 + pad1
    wp = ws + pad0 + pad1
    padded = np.zeros((n, max(hp, 0), max(wp, 0), c), dtype=np.float64)
    src_y0, src_x0 = max(-pad0, 0), max(-pad0, 0)
    src_y1, src_x1 = hs - max(-pad1, 0), ws - max(-pad1, 0)
    dst_y0, dst_x0 = max(pad0, 0), max(pad0, 0)
    sl_h = src_y1 - src_y0
    sl_w = src_x1 - src_x0
    padded[:, dst_y0 : dst_y0 + sl_h, dst_x0 : dst_x0 + sl_w, :] = stuffed[
        :, src_y0:src_y1, src_x0:src_x1, :
    ]

    # 3. true convolution (flip kernel, correlate), valid
    oh = hp - kh + 1
    ow = wp - kw + 1
    kf = kernel[::-1, ::-1]
    out = np.zeros((n, oh, ow, c), dtype=np.float64)
    for i in range(oh):
        for j in range(ow):
            patch = padded[:, i : i + kh, j : j + kw, :]
            out[:, i, j, :] = np.einsum("nhwc,hw->nc", patch, kf)

    # 4. decimate
    return out[:, ::down, ::down, :]


@pytest.mark.parametrize(
    "up,down,pad",
    [
        (1, 1, (0, 0)),
        (1, 1, (2, 1)),
        (2, 1, (2, 1)),  # StyleGAN2 Upsample config for 4-tap kernel
        (1, 2, (2, 1)),
        (1, 2, (1, 1)),  # Downsample config
        (2, 2, (1, 2)),
        (1, 1, (-1, -1)),  # negative padding = crop
        (2, 1, (3, -1)),
    ],
)
def test_upfirdn2d_matches_oracle(up, down, pad):
    rng = np.random.RandomState(0)
    x = rng.randn(2, 7, 9, 3).astype(np.float32)
    k1d = np.array([1.0, 3.0, 3.0, 1.0])
    k = np.outer(k1d, k1d)
    k /= k.sum()

    want = upfirdn2d_oracle(x.astype(np.float64), k, up, down, pad[0], pad[1])
    got = np.asarray(upfirdn2d(jnp.asarray(x), jnp.asarray(k, dtype=jnp.float32), up=up, down=down, pad=pad))

    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_output_shape_formula():
    # out = (in*up + pad0 + pad1 - k) // down + 1  (reference contract)
    x = jnp.ones((1, 8, 8, 2))
    k = make_kernel([1, 3, 3, 1])
    y = upfirdn2d(x, k, up=2, down=1, pad=(2, 1))
    assert y.shape == (1, 16, 16, 2)
    y = upfirdn2d(x, k, up=1, down=2, pad=(1, 1))
    assert y.shape == (1, 4, 4, 2)


def test_upsample_downsample_roundtrip_shapes():
    x = jnp.asarray(np.random.RandomState(1).randn(2, 8, 8, 4).astype(np.float32))
    k = make_kernel([1, 3, 3, 1])
    up = upsample_2x(x, k)
    assert up.shape == (2, 16, 16, 4)
    down = downsample_2x(up, k)
    assert down.shape == (2, 8, 8, 4)


def test_blur_preserves_shape_and_dc():
    # A normalized FIR kernel passes DC: blurring a constant image is identity.
    x = jnp.ones((1, 6, 6, 1), jnp.float32) * 3.14
    k = make_kernel([1, 3, 3, 1])
    y = blur(x, k, pad=(2, 1))
    assert y.shape == (1, 6, 6, 1)
    interior = np.asarray(y)[0, 2:-2, 2:-2, 0]
    np.testing.assert_allclose(interior, 3.14, rtol=1e-5)


def test_make_kernel_normalized_outer_product():
    k = np.asarray(make_kernel([1, 3, 3, 1]))
    assert k.shape == (4, 4)
    np.testing.assert_allclose(k.sum(), 1.0, rtol=1e-6)
    np.testing.assert_allclose(k[0, 0] * 9, k[1, 1], rtol=1e-6)


def test_blur_separable_path_matches_conv_form():
    """The shifted-MAC separable blur == the one-conv upfirdn2d form for
    rank-1 kernels; non-separable kernels and negative pads fall back."""
    from gan_control_tpu.ops.upfirdn2d import (
        _separable_taps,
        blur,
        make_kernel,
        upfirdn2d,
    )

    from gan_control_tpu.ops.upfirdn2d import _blur_separable

    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.standard_normal((2, 12, 12, 5)).astype(np.float32))
    k = make_kernel((1.0, 3.0, 3.0, 1.0))
    sep = _separable_taps(k)
    assert sep is not None
    got = _blur_separable(x, sep[0], sep[1], pad=(2, 2))
    want = upfirdn2d(x, k, up=1, down=1, pad=(2, 2))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)

    # asymmetric taps (flip matters) still agree
    k2 = make_kernel((1.0, 2.0, 4.0, 0.5))
    sep2 = _separable_taps(k2)
    got2 = _blur_separable(x, sep2[0], sep2[1], pad=(1, 2))
    want2 = upfirdn2d(x, k2, up=1, down=1, pad=(1, 2))
    np.testing.assert_allclose(np.asarray(got2), np.asarray(want2),
                               rtol=1e-5, atol=1e-6)

    # blur() defaults to the one-conv path at every dtype (the measured
    # winner on v5e — see blur() docstring); bf16 parity at bf16
    # tolerances
    xb = x.astype(jnp.bfloat16)
    got_b = blur(xb, k.astype(jnp.bfloat16), pad=(2, 2))
    np.testing.assert_allclose(
        np.asarray(got_b, np.float32), np.asarray(want), rtol=0.05, atol=0.05
    )

    # rank-2 kernel: no separable taps (falls back to the conv path)
    k_ns = jnp.asarray(np.eye(3, dtype=np.float32) / 3.0)
    assert _separable_taps(k_ns) is None
    got3 = blur(x, k_ns, pad=(1, 1))
    want3 = upfirdn2d(x, k_ns, up=1, down=1, pad=(1, 1))
    np.testing.assert_allclose(np.asarray(got3), np.asarray(want3),
                               rtol=1e-5, atol=1e-6)

    # negative pad (crop) keeps the conv path and still works
    got4 = blur(x, k, pad=(-1, 2))
    assert got4.shape == upfirdn2d(x, k, up=1, down=1, pad=(-1, 2)).shape


def test_blur_separable_gradient_flows():
    import jax

    from gan_control_tpu.ops.upfirdn2d import blur, make_kernel

    k = make_kernel((1.0, 3.0, 3.0, 1.0))
    x = jnp.ones((1, 8, 8, 2))
    g = jax.grad(lambda x: jnp.sum(blur(x, k, pad=(2, 2)) ** 2))(x)
    assert g.shape == x.shape
    assert float(jnp.max(jnp.abs(g))) > 0
