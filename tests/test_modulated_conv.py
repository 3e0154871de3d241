"""Parity tests: input-scale/output-demod modulated conv vs a per-sample
torch oracle implementing the grouped-conv formulation of StyleGAN2.

The oracle modulates+demodulates an explicit per-sample weight and runs one
conv per sample — the O(B) reference formulation — so agreement proves the
factored TPU form computes the same function.
"""

import math

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from gan_control_tpu.ops import modulated_conv2d, make_kernel


def _oracle(x_nchw, w_oihw, style, demodulate, mode):
    """Per-sample modulated conv. mode in {none, up, down}."""
    b, cin, h, wdt = x_nchw.shape
    cout, _, k, _ = w_oihw.shape
    scale = 1.0 / math.sqrt(cin * k * k)

    blur_k = torch.tensor(np.outer([1, 3, 3, 1], [1, 3, 3, 1]), dtype=torch.float64)
    blur_k = blur_k / blur_k.sum()

    def fir(img, kern, up, down, pad0, pad1):
        # textbook upfirdn per channel via conv2d
        n, c, ih, iw = img.shape
        stuffed = torch.zeros(n, c, ih * up, iw * up, dtype=img.dtype)
        stuffed[:, :, ::up, ::up] = img
        padded = F.pad(stuffed, (max(pad0, 0), max(pad1, 0), max(pad0, 0), max(pad1, 0)))
        if pad0 < 0 or pad1 < 0:
            padded = padded[
                :, :, max(-pad0, 0) : padded.shape[2] - max(-pad1, 0),
                max(-pad0, 0) : padded.shape[3] - max(-pad1, 0),
            ]
        kf = torch.flip(kern, [0, 1])[None, None].repeat(c, 1, 1, 1)
        out = F.conv2d(padded, kf, groups=c)
        return out[:, :, ::down, ::down]

    outs = []
    for i in range(b):
        w = scale * w_oihw * style[i].view(1, cin, 1, 1)
        if demodulate:
            d = torch.rsqrt(w.pow(2).sum([1, 2, 3]) + 1e-8)
            w = w * d.view(cout, 1, 1, 1)
        xi = x_nchw[i : i + 1]
        if mode == "up":
            y = F.conv_transpose2d(xi, w.transpose(0, 1), stride=2, padding=0)
            # blur: kernel gain x4, pads for klen=4, k=3: p=(4-2)-(3-1)=0
            p0 = (0 + 1) // 2 + 1  # 1
            p1 = 0 // 2 + 1  # 1
            y = fir(y, blur_k * 4, 1, 1, p0, p1)
        elif mode == "down":
            p = (4 - 2) + (k - 1)
            y = fir(xi, blur_k, 1, 1, (p + 1) // 2, p // 2)
            y = F.conv2d(y, w, stride=2, padding=0)
        else:
            y = F.conv2d(xi, w, padding=k // 2)
        outs.append(y)
    return torch.cat(outs, 0)


@pytest.mark.parametrize("demodulate", [True, False])
@pytest.mark.parametrize("mode", ["none", "up", "down"])
def test_modulated_conv_matches_grouped_oracle(demodulate, mode):
    rng = np.random.RandomState(42)
    b, cin, cout, k, h = 3, 5, 7, 3, 8
    x = rng.randn(b, h, h, cin).astype(np.float64)
    w_hwio = rng.randn(k, k, cin, cout).astype(np.float64)
    style = (rng.rand(b, cin) * 2 + 0.5).astype(np.float64)

    blur_kernel = make_kernel([1, 3, 3, 1])
    got = modulated_conv2d(
        jnp.asarray(x),
        jnp.asarray(w_hwio),
        jnp.asarray(style),
        demodulate=demodulate,
        upsample=(mode == "up"),
        downsample=(mode == "down"),
        blur_kernel=blur_kernel.astype(jnp.float64),
    )

    x_t = torch.from_numpy(x.transpose(0, 3, 1, 2))
    w_t = torch.from_numpy(w_hwio.transpose(3, 2, 0, 1)).contiguous()  # OIHW
    want = _oracle(x_t, w_t, torch.from_numpy(style), demodulate, mode)
    want = want.numpy().transpose(0, 2, 3, 1)

    assert got.shape == want.shape, (got.shape, want.shape)
    np.testing.assert_allclose(np.asarray(got), want, rtol=5e-4, atol=1e-6)


def test_modulated_conv_1x1_torgb_case():
    # ToRGB uses kernel 1, demodulate=False (reference models/gan_model.py:421)
    rng = np.random.RandomState(7)
    x = rng.randn(2, 4, 4, 6).astype(np.float32)
    w = rng.randn(1, 1, 6, 3).astype(np.float32)
    s = rng.rand(2, 6).astype(np.float32) + 0.5
    y = modulated_conv2d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(s), demodulate=False)
    scale = 1.0 / math.sqrt(6)
    want = np.einsum("nhwi,io,ni->nhwo", x, w[0, 0] * scale, s)
    np.testing.assert_allclose(np.asarray(y), want, rtol=1e-4, atol=1e-5)


def test_overwrite_padding_zero():
    # '896' mode passes padding=0 -> spatial shrink by k-1 (reference :262-264)
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(1, 8, 8, 4).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 4, 4).astype(np.float32))
    s = jnp.ones((1, 4), jnp.float32)
    y = modulated_conv2d(x, w, s, padding=0)
    assert y.shape == (1, 6, 6, 4)
