"""Shared building blocks for frozen predictor networks.

TPU-first notes:
  - Frozen BatchNorm keeps (scale, bias, mean, var) as plain params — at
    inference the whole op folds into one multiply-add that XLA fuses into
    the adjacent conv.
  - Bilinear resize is expressed as TWO SMALL MATMULS (out = R_h @ x @ R_wᵀ
    per channel): the interpolation matrices are built host-side at trace
    time, so arbitrary align_corners semantics (needed for torch parity,
    e.g. ArcFace's align_corners=True resize, arc_face_skeleton.py:31) cost
    two MXU ops instead of a gather. jax.image.resize only provides
    half-pixel (align_corners=False) sampling.
"""

from __future__ import annotations

import functools

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class FrozenBatchNorm(nn.Module):
    """Inference-mode BatchNorm2d/1d; channel-last."""

    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.param("mean", nn.initializers.zeros, (self.features,))
        var = self.param("var", nn.initializers.ones, (self.features,))
        # Fold in f32 even when params are stored in bf16: rsqrt(var+eps)
        # would absorb eps for var >~ 0.01 at bf16 precision. Only the two
        # folded per-channel constants are cast to x.dtype, so the HBM
        # footprint of the stored params is unchanged.
        scale32 = scale.astype(jnp.float32)
        inv32 = scale32 * jax.lax.rsqrt(var.astype(jnp.float32) + self.eps)
        off32 = bias.astype(jnp.float32) - mean.astype(jnp.float32) * inv32
        return x * inv32.astype(x.dtype) + off32.astype(x.dtype)


class PReLU(nn.Module):
    """Per-channel PReLU (channel-last)."""

    features: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        alpha = self.param(
            "alpha", lambda k, s: jnp.full(s, 0.25, jnp.float32), (self.features,)
        )
        return jnp.where(x >= 0, x, alpha.astype(x.dtype) * x)


class Conv(nn.Module):
    """Plain conv, NHWC/HWIO, torch-style padding: int (symmetric) or
    (pad_h, pad_w) tuple; kernel_size likewise int or (kh, kw)."""

    features: int
    kernel_size: int | tuple = 1
    stride: int = 1
    padding: int | tuple = 0
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        k = self.kernel_size
        kh, kw = (k, k) if isinstance(k, int) else k
        p = self.padding
        ph, pw = (p, p) if isinstance(p, int) else p
        w = self.param(
            "weight",
            nn.initializers.variance_scaling(2.0, "fan_in", "normal"),
            (kh, kw, x.shape[-1], self.features),
        )
        y = jax.lax.conv_general_dilated(
            x,
            w.astype(x.dtype),
            window_strides=(self.stride, self.stride),
            padding=((ph, ph), (pw, pw)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + b.astype(y.dtype)
        return y


class Dense(nn.Module):
    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        w = self.param(
            "weight",
            nn.initializers.variance_scaling(2.0, "fan_in", "normal"),
            (x.shape[-1], self.features),
        )
        y = x @ w.astype(x.dtype)
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + b.astype(y.dtype)
        return y


def max_pool(x: jax.Array, window: int, stride: int, padding: int = 0) -> jax.Array:
    """torch MaxPool2d semantics (NHWC)."""
    if window == 1:
        return x[:, ::stride, ::stride, :]
    pads = ((0, 0), (padding, padding), (padding, padding), (0, 0))
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, window, window, 1), (1, stride, stride, 1), pads
    )


def avg_pool(x: jax.Array, window: int, stride: int, padding: int = 0) -> jax.Array:
    pads = ((0, 0), (padding, padding), (padding, padding), (0, 0))
    s = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, window, window, 1), (1, stride, stride, 1), pads
    )
    return s / (window * window)


def global_avg_pool(x: jax.Array) -> jax.Array:
    return jnp.mean(x, axis=(1, 2), keepdims=True)


def center_crop(x: jax.Array, crop: int) -> jax.Array:
    """NHWC center crop (reference utils/tensor_transforms.py)."""
    h, w = x.shape[1], x.shape[2]
    up, left = (h - crop) // 2, (w - crop) // 2
    return x[:, up : up + crop, left : left + crop, :]


def _cubic_kernel(t: float, a: float = -0.75) -> float:
    """Keys cubic convolution kernel (torch bicubic uses a=-0.75)."""
    t = abs(t)
    if t <= 1:
        return (a + 2) * t**3 - (a + 3) * t**2 + 1
    if t < 2:
        return a * t**3 - 5 * a * t**2 + 8 * a * t - 4 * a
    return 0.0


@functools.lru_cache(maxsize=64)
def _resize_matrix(
    in_size: int, out_size: int, align_corners: bool, method: str = "bilinear"
) -> np.ndarray:
    """[out, in] 1-D interpolation matrix (bilinear or bicubic)."""
    m = np.zeros((out_size, in_size), np.float32)
    if out_size == 1:
        m[0, (in_size - 1) // 2 if align_corners else 0] = 1.0
        return m
    for i in range(out_size):
        if align_corners:
            src = i * (in_size - 1) / (out_size - 1)
        else:
            src = (i + 0.5) * in_size / out_size - 0.5
        if method == "bilinear":
            src = min(max(src, 0.0), in_size - 1)
            lo = int(np.floor(src))
            hi = min(lo + 1, in_size - 1)
            frac = src - lo
            m[i, lo] += 1 - frac
            m[i, hi] += frac
        else:  # bicubic: 4 taps, border-clamped (torch semantics)
            lo = int(np.floor(src))
            for tap in range(lo - 1, lo + 3):
                wgt = _cubic_kernel(src - tap)
                m[i, min(max(tap, 0), in_size - 1)] += wgt
    return m


def _resize_matmul(x, out_hw, align_corners, method):
    h, w = x.shape[1], x.shape[2]
    rh = jnp.asarray(_resize_matrix(h, out_hw[0], align_corners, method), x.dtype)
    rw = jnp.asarray(_resize_matrix(w, out_hw[1], align_corners, method), x.dtype)
    y = jnp.einsum("oh,bhwc->bowc", rh, x)
    return jnp.einsum("pw,bowc->bopc", rw, y)


def resize_bilinear(
    x: jax.Array, out_hw: tuple[int, int], align_corners: bool = False
) -> jax.Array:
    """NHWC bilinear resize via two matmuls (see module docstring)."""
    return _resize_matmul(x, out_hw, align_corners, "bilinear")


def resize_bicubic(
    x: jax.Array, out_hw: tuple[int, int], align_corners: bool = False
) -> jax.Array:
    """NHWC bicubic resize via two matmuls (torch a=-0.75 kernel)."""
    return _resize_matmul(x, out_hw, align_corners, "bicubic")


@functools.lru_cache(maxsize=64)
def _adaptive_pool_matrix(in_size: int, out_size: int) -> np.ndarray:
    """[out, in] averaging matrix with torch AdaptiveAvgPool2d windows
    [floor(i*in/out), ceil((i+1)*in/out))."""
    m = np.zeros((out_size, in_size), np.float32)
    for i in range(out_size):
        lo = (i * in_size) // out_size
        hi = -((-(i + 1) * in_size) // out_size)  # ceil
        m[i, lo:hi] = 1.0 / (hi - lo)
    return m


def adaptive_avg_pool(x: jax.Array, out_size: int) -> jax.Array:
    """NHWC adaptive average pool to (out_size, out_size) via two matmuls."""
    h, w = x.shape[1], x.shape[2]
    rh = jnp.asarray(_adaptive_pool_matrix(h, out_size), x.dtype)
    rw = jnp.asarray(_adaptive_pool_matrix(w, out_size), x.dtype)
    y = jnp.einsum("oh,bhwc->bowc", rh, x)
    return jnp.einsum("pw,bowc->bopc", rw, y)


def l2_normalize(x: jax.Array, axis: int = -1, eps: float = 0.0) -> jax.Array:
    """x / ||x||_2 (reference arc_face_model.l2_norm uses no eps)."""
    norm = jnp.sqrt(jnp.sum(jnp.square(x), axis=axis, keepdims=True) + eps)
    return x / norm
