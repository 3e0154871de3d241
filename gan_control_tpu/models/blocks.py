"""L1 model blocks (flax.linen, NHWC).

Behavior contracts cite /root/reference/src/gan_control/models/gan_model.py.
Everything is re-expressed for TPU: NHWC activations, HWIO weights, the
modulated conv in its factored MXU-friendly form (see ops/modulated_conv.py),
and explicit PRNG threading instead of implicit CUDA randomness.
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp

from gan_control_tpu.ops import (
    fused_leaky_relu,
    make_kernel,
    modulated_conv2d,
    upsample_2x,
)
from gan_control_tpu.ops.fused_act import scaled_leaky_relu
from gan_control_tpu.ops.upfirdn2d import blur, blur_pad_downsample


def pixel_norm(x: jax.Array, eps: float = 1e-8) -> jax.Array:
    """z / sqrt(mean(z^2)) across features (reference: PixelNorm, :52-57)."""
    return x * jax.lax.rsqrt(jnp.mean(jnp.square(x), axis=-1, keepdims=True) + eps)


class EqualLinear(nn.Module):
    """Equalized-learning-rate dense layer (reference: EqualLinear, :171-202).

    Parameters are stored at N(0, 1/lr_mul) and multiplied by
    ``scale = lr_mul / sqrt(in_dim)`` at use, so the effective weight std is
    ``1/sqrt(in_dim)`` while gradient magnitudes scale with ``lr_mul``.
    With ``activation='fused_lrelu'`` the bias is applied inside the fused
    bias+leaky-relu+sqrt(2) op.
    """

    features: int
    use_bias: bool = True
    bias_init: float = 0.0
    lr_mul: float = 1.0
    activation: str | None = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_dim = x.shape[-1]
        kernel = self.param(
            "kernel",
            lambda key, shape: jax.random.normal(key, shape) / self.lr_mul,
            (in_dim, self.features),
        )
        scale = (1.0 / math.sqrt(in_dim)) * self.lr_mul
        y = x @ (kernel * scale).astype(x.dtype)
        bias = None
        if self.use_bias:
            bias = self.param(
                "bias",
                # strong f32 (a python-float fill would create a weak-typed
                # param whose dtype "hardens" after the first optimizer
                # update, recompiling every jitted step once per round)
                lambda key, shape: jnp.full(shape, self.bias_init, jnp.float32),
                (self.features,),
            )
        if self.activation == "fused_lrelu":
            y = fused_leaky_relu(y, None if bias is None else bias * self.lr_mul)
        elif self.activation is None:
            if bias is not None:
                y = y + (bias * self.lr_mul).astype(y.dtype)
        else:
            raise ValueError(f"unknown activation {self.activation}")
        return y


class EqualConv2d(nn.Module):
    """Equalized-lr conv (reference: EqualConv2d, :132-168). NHWC/HWIO."""

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_ch = x.shape[-1]
        k = self.kernel_size
        weight = self.param(
            "kernel", nn.initializers.normal(1.0), (k, k, in_ch, self.features)
        )
        scale = 1.0 / math.sqrt(in_ch * k * k)
        y = jax.lax.conv_general_dilated(
            x,
            (weight * scale).astype(x.dtype),
            window_strides=(self.stride, self.stride),
            padding=((self.padding, self.padding), (self.padding, self.padding)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias.astype(y.dtype)
        return y


class ModulatedConv2d(nn.Module):
    """Style-modulated conv block: modulation EqualLinear + factored conv.

    Reference: ModulatedConv2d (:217-331). The modulation layer maps
    style_dim -> in_channels with bias_init=1 (:271); demodulation and the
    up/down resampling paths live in ops.modulated_conv2d.
    """

    features: int
    kernel_size: int
    demodulate: bool = True
    upsample: bool = False
    downsample: bool = False
    blur_kernel: tuple = (1, 3, 3, 1)
    overwrite_padding: int | None = None

    @nn.compact
    def __call__(self, x: jax.Array, style_vec: jax.Array) -> jax.Array:
        in_ch = x.shape[-1]
        k = self.kernel_size
        weight = self.param(
            "kernel", nn.initializers.normal(1.0), (k, k, in_ch, self.features)
        )
        s = EqualLinear(in_ch, bias_init=1.0, name="modulation")(style_vec)
        return modulated_conv2d(
            x,
            weight,
            s,
            demodulate=self.demodulate,
            upsample=self.upsample,
            downsample=self.downsample,
            blur_kernel=make_kernel(self.blur_kernel).astype(x.dtype),
            padding=self.overwrite_padding,
        )


class NoiseInjection(nn.Module):
    """x + w * noise with a learned scalar (reference: NoiseInjection, :334-345).

    noise: [B, H, W, 1] or None -> drawn from the 'noise' PRNG stream.
    """

    @nn.compact
    def __call__(self, x: jax.Array, noise: jax.Array | None = None) -> jax.Array:
        w = self.param("weight", nn.initializers.zeros, (1,))
        if noise is None:
            b, h, wdt, _ = x.shape
            noise = jax.random.normal(self.make_rng("noise"), (b, h, wdt, 1), x.dtype)
        return x + w.astype(x.dtype) * noise


class ModulatedNoiseInjection(nn.Module):
    """Noise-mode variants (reference: ModulatedNoiseInjection, :1019-1036):

    zeros   — noise disabled entirely.
    id_zeros — noise added only to the first half of channels ("pose" half);
      the second ("id") half stays deterministic. NHWC: channel split on the
      last axis.
    """

    zeros: bool = False
    id_zeros: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, noise: jax.Array | None = None) -> jax.Array:
        if not (self.zeros or self.id_zeros):
            raise ValueError(
                "ModulatedNoiseInjection needs zeros or id_zeros (the "
                "reference's forward returns None in that case — a bug its "
                "callers never hit; use NoiseInjection for normal mode)"
            )
        # the weight param is registered even in zeros mode (the reference
        # constructs nn.Parameter unconditionally, :1024) so checkpoints
        # and parameter-tree mappings line up
        w = self.param("weight", nn.initializers.zeros, (1,))
        if self.zeros:
            return x
        if noise is None:
            b, h, wdt, _ = x.shape
            noise = jax.random.normal(self.make_rng("noise"), (b, h, wdt, 1), x.dtype)
        half = x.shape[-1] // 2
        pose, ident = x[..., :half], x[..., half:]
        return jnp.concatenate([pose + w.astype(x.dtype) * noise, ident], axis=-1)


class ConstantInput(nn.Module):
    """Learned constant 4x4 input map (reference: ConstantInput, :348-358)."""

    channels: int
    size: int = 4

    @nn.compact
    def __call__(self, batch: int) -> jax.Array:
        const = self.param(
            "const", nn.initializers.normal(1.0), (1, self.size, self.size, self.channels)
        )
        return jnp.broadcast_to(const, (batch, self.size, self.size, self.channels))


class StyledConv(nn.Module):
    """ModulatedConv2d -> noise injection -> fused bias+leaky-relu.

    Reference: StyledConv (:361-408) with noise_mode dispatch (:390-396).
    """

    features: int
    kernel_size: int
    upsample: bool = False
    demodulate: bool = True
    blur_kernel: tuple = (1, 3, 3, 1)
    overwrite_padding: int | None = None
    noise_mode: str = "normal"

    @nn.compact
    def __call__(
        self, x: jax.Array, style_vec: jax.Array, noise: jax.Array | None = None
    ) -> jax.Array:
        y = ModulatedConv2d(
            self.features,
            self.kernel_size,
            demodulate=self.demodulate,
            upsample=self.upsample,
            blur_kernel=self.blur_kernel,
            overwrite_padding=self.overwrite_padding,
            name="conv",
        )(x, style_vec)
        if self.noise_mode in ("normal", "same_for_same_id"):
            y = NoiseInjection(name="noise")(y, noise)
        elif self.noise_mode == "zeros":
            y = ModulatedNoiseInjection(zeros=True, name="noise")(y, noise)
        elif self.noise_mode == "id_zeros":
            y = ModulatedNoiseInjection(id_zeros=True, name="noise")(y, noise)
        else:
            raise ValueError(f"unknown noise_mode {self.noise_mode}")
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return fused_leaky_relu(y, bias)


class ToRGB(nn.Module):
    """1x1 modulated conv (no demod) + bias + upsampled skip accumulation.

    Reference: ToRGB (:411-435) incl. the '896'-mode negative crop of the
    skip (:430-431).
    """

    out_channels: int = 3
    upsample: bool = True
    blur_kernel: tuple = (1, 3, 3, 1)
    overwrite_negative_padding: int | None = None

    @nn.compact
    def __call__(
        self, x: jax.Array, style_vec: jax.Array, skip: jax.Array | None = None
    ) -> jax.Array:
        y = ModulatedConv2d(self.out_channels, 1, demodulate=False, name="conv")(
            x, style_vec
        )
        bias = self.param("bias", nn.initializers.zeros, (self.out_channels,))
        y = y + bias.astype(y.dtype)
        if skip is not None:
            k = make_kernel(self.blur_kernel).astype(x.dtype)
            skip = upsample_2x(skip, k)
            if self.overwrite_negative_padding is not None:
                c = -self.overwrite_negative_padding
                skip = skip[:, c:-c, c:-c, :]
            y = y + skip
        return y


class ConvLayer(nn.Module):
    """Discriminator conv: optional FIR blur + stride-2, then activation.

    Reference: ConvLayer (:844-890).
    """

    features: int
    kernel_size: int
    downsample: bool = False
    blur_kernel: tuple = (1, 3, 3, 1)
    use_bias: bool = True
    activate: bool = True

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        if self.downsample:
            pad0, pad1 = blur_pad_downsample(len(self.blur_kernel), self.kernel_size)
            x = blur(x, make_kernel(self.blur_kernel).astype(x.dtype), pad=(pad0, pad1))
            stride, padding = 2, 0
        else:
            stride, padding = 1, self.kernel_size // 2
        y = EqualConv2d(
            self.features,
            self.kernel_size,
            stride=stride,
            padding=padding,
            use_bias=self.use_bias and not self.activate,
            name="conv",
        )(x)
        if self.activate:
            if self.use_bias:
                bias = self.param("bias", nn.initializers.zeros, (self.features,))
                y = fused_leaky_relu(y, bias)
            else:
                y = scaled_leaky_relu(y)
        return y


class ResBlock(nn.Module):
    """D residual block: conv3 -> downsample conv3, 1x1 downsample skip,
    (out+skip)/sqrt(2). Reference: ResBlock (:893-922) incl. the fractional
    '896'-mode pre-pad (:907-909).
    """

    features: int
    blur_kernel: tuple = (1, 3, 3, 1)
    overwrite_padding: float | None = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        if self.overwrite_padding is not None:
            lo = int(self.overwrite_padding)
            hi = int(self.overwrite_padding + 0.51)
            x = jnp.pad(x, ((0, 0), (lo, hi), (lo, hi), (0, 0)))
        in_ch = x.shape[-1]
        y = ConvLayer(in_ch, 3, name="conv1")(x)
        y = ConvLayer(self.features, 3, downsample=True, blur_kernel=self.blur_kernel, name="conv2")(y)
        skip = ConvLayer(
            self.features, 1, downsample=True, blur_kernel=self.blur_kernel,
            activate=False, use_bias=False, name="skip",
        )(x)
        return (y + skip) * (1.0 / math.sqrt(2.0))


def minibatch_stddev(x: jax.Array, group_size: int = 4, num_features: int = 1) -> jax.Array:
    """Append the cross-sample stddev statistic channel.

    Reference: Discriminator._forward_split (:1003-1012): groups of
    min(batch, 4), unbiased=False variance over the group, sqrt(var+1e-8),
    mean over (features-within-split, H, W), broadcast back and concatenated
    as one extra channel. NHWC throughout.
    """
    b, h, w, c = x.shape
    g = min(b, group_size)
    grouped = x.reshape(g, b // g, h, w, num_features, c // num_features)
    var = jnp.var(grouped, axis=0)  # [b//g, h, w, feat, c//feat]
    std = jnp.sqrt(var + 1e-8)
    stat = jnp.mean(std, axis=(1, 2, 4))  # mean over H, W, channels-per-split -> [b//g, feat]
    stat = stat[:, None, None, :]  # [b//g, 1, 1, feat]
    stat = jnp.tile(stat, (g, h, w, 1))  # [b, h, w, feat]
    return jnp.concatenate([x, stat], axis=-1)
