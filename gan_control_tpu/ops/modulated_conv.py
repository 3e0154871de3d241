"""Modulated convolution (StyleGAN2) — input-scale / output-demodulate form.

Semantics contract (reference: ModulatedConv2d, models/gan_model.py:217-331):
per sample ``b`` the conv weight is modulated by a per-input-channel style
scale ``s[b, i]`` and (optionally) demodulated so each output channel has
unit expected norm:

    w_b[o,i,h,w] = scale * W[o,i,h,w] * s[b,i]
    demod[b,o]  = rsqrt( sum_{i,h,w} w_b[o,i,h,w]^2 + 1e-8 )
    y_b         = conv(x_b, w_b * demod[b])

The reference realizes this with a grouped conv over ``groups=batch`` and a
materialized ``[B*out, in, k, k]`` weight tensor — hostile to the TPU MXU
(tiny per-group convs, B× weight traffic). Because the conv is linear in a
per-input-channel scaling, the identical math factors into three fused-able
pieces that keep ONE batched conv on the MXU with the original weights:

    y_b = demod[b] * conv(x_b * s[b], scale * W)

``demod`` itself needs no per-sample weights either — the sum of squares
factorizes:

    demod[b,o] = rsqrt( sum_i (sum_{h,w} (scale*W[o,i,h,w])^2) * s[b,i]^2 + 1e-8 )

i.e. a [in,out] reduction of W followed by a [B,in]x[in,out] matmul.

Up/downsampling follows the reference exactly: upsample is a stride-2
transposed conv followed by an FIR blur (models/gan_model.py:300-307) —
expressed here as a single lhs-dilated XLA conv; downsample is FIR blur then
a stride-2 valid conv (:318-324).

Layout: NHWC activations, HWIO weights (XLA TPU native).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from gan_control_tpu.ops.upfirdn2d import blur_pad_downsample, blur_pad_upsample

_DEMOD_EPS = 1e-8


def _fuse_kernels(corr1: jax.Array, corr2: jax.Array) -> jax.Array:
    """Compose two correlation kernels into one: corr(corr(x, A), B) ==
    corr(x, A (*) B) with (*) = full 2-D convolution of the kernels.

    corr1: [kh, kw, I, O] per-channel-pair kernel; corr2: [bh, bw] depthwise
    FIR. Returns [kh+bh-1, kw+bw-1, I, O]."""
    kh, kw, ci, co = corr1.shape
    bh, bw = corr2.shape
    # full convolution of each (i,o) plane with corr2 == correlation with
    # the flipped corr2 at full padding
    k = jnp.transpose(corr1, (2, 3, 0, 1)).reshape(ci * co, 1, kh, kw)
    b = jnp.flip(corr2, (0, 1))[None, None]  # OIHW [1,1,bh,bw]
    out = lax.conv_general_dilated(
        k, b,
        window_strides=(1, 1),
        padding=((bh - 1, bh - 1), (bw - 1, bw - 1)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    return jnp.transpose(out.reshape(ci, co, kh + bh - 1, kw + bw - 1), (2, 3, 0, 1))


def _demod_factors(weight_scaled: jax.Array, style: jax.Array) -> jax.Array:
    """rsqrt of per-(sample, out-channel) modulated-weight energy.

    Args:
      weight_scaled: [kh, kw, in, out], already multiplied by the equalized-lr
        scale.
      style: [B, in] per-sample input-channel scales.
    Returns:
      [B, out] demodulation factors.
    """
    w_sq = jnp.sum(jnp.square(weight_scaled), axis=(0, 1))  # [in, out]
    energy = jnp.square(style) @ w_sq  # [B, out]
    return lax.rsqrt(energy + _DEMOD_EPS)


def modulated_conv2d(
    x: jax.Array,
    weight: jax.Array,
    style: jax.Array,
    *,
    demodulate: bool = True,
    upsample: bool = False,
    downsample: bool = False,
    blur_kernel: jax.Array | None = None,
    padding: int | None = None,
) -> jax.Array:
    """Style-modulated conv on NHWC input.

    Args:
      x: [B, H, W, in] activations.
      weight: [kh, kw, in, out] raw (unit-variance-initialized) weights; the
        equalized-lr scale ``1/sqrt(in*kh*kw)`` is applied here, matching
        models/gan_model.py:259-260.
      style: [B, in] modulation scales (output of the modulation EqualLinear,
        bias_init=1 — that layer lives in the model block, not here).
      demodulate: apply the rsqrt weight-energy normalization.
      upsample: stride-2 transposed conv + FIR blur path.
      downsample: FIR blur + stride-2 conv path.
      blur_kernel: normalized FIR kernel (required when up/downsampling).
      padding: override for the same-size path; default ``k//2``. The '896'
        model mode passes 0 (reference: overwrite_padding,
        models/gan_model.py:262-264).

    Returns:
      [B, H', W', out].
    """
    if upsample and downsample:
        raise ValueError("upsample and downsample are mutually exclusive")
    kh, kw, c_in, c_out = weight.shape
    if kh != kw:
        raise ValueError("square kernels only")
    k = kh

    scale = 1.0 / np.sqrt(c_in * k * k)
    w = (weight * scale).astype(x.dtype)

    xs = x * style[:, None, None, :].astype(x.dtype)

    if upsample:
        # Single fused conv: transposed stride-2 conv and the trailing FIR
        # blur are both correlations, so their kernels compose into ONE
        # (k + blur - 1)-tap kernel applied to the lhs-dilated input —
        # halving the conv count on every upsample layer. Padding algebra:
        # the transposed conv pads (k-1) and the blur pads
        # blur_pad_upsample(len_b, k); the fused conv pads their sum.
        # (Unfused equivalent kept in tests as the parity oracle.)
        len_b = blur_kernel.shape[0]
        bp0, bp1 = blur_pad_upsample(len_b, k)
        fused = _fuse_kernels(
            jnp.flip(w, (0, 1)),
            jnp.flip(blur_kernel, (0, 1)).astype(x.dtype) * 4.0,  # gain = factor^2
        )
        out = lax.conv_general_dilated(
            xs,
            fused,
            window_strides=(1, 1),
            padding=((k - 1 + bp0, k - 1 + bp1), (k - 1 + bp0, k - 1 + bp1)),
            lhs_dilation=(2, 2),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if demodulate:
            # demod is per-(sample, out-channel); the depthwise blur
            # commutes with it, so applying after the fused conv is exact
            out = out * _demod_factors(weight * scale, style)[:, None, None, :].astype(x.dtype)
        return out

    if downsample:
        # Same fusion for the downsample path: FIR blur then stride-2 conv
        # == one stride-2 conv with the composed kernel.
        len_b = blur_kernel.shape[0]
        bp0, bp1 = blur_pad_downsample(len_b, k)
        # compose (depthwise blur) then w: corr(corr(x, flipB), w) ==
        # corr(x, flipB (*) w); flipB is shared across channels, so it folds
        # into w directly (kernel convolution is commutative).
        fused = _fuse_kernels(w, jnp.flip(blur_kernel, (0, 1)).astype(x.dtype))
        out = lax.conv_general_dilated(
            xs,
            fused,
            window_strides=(2, 2),
            padding=((bp0, bp1), (bp0, bp1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if demodulate:
            out = out * _demod_factors(weight * scale, style)[:, None, None, :].astype(x.dtype)
        return out

    pad = k // 2 if padding is None else padding
    out = lax.conv_general_dilated(
        xs,
        w,
        window_strides=(1, 1),
        padding=((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if demodulate:
        out = out * _demod_factors(weight * scale, style)[:, None, None, :].astype(x.dtype)
    return out
