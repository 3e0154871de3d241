"""StyleGAN2-class Discriminator with optional verification branch.

Behavior contract: Discriminator in reference models/gan_model.py:925-1016 —
1x1 fromRGB ConvLayer, ResBlock pyramid halving resolution down to 4x4,
minibatch-stddev statistic channel, final 3x3 conv + 2-layer MLP head to one
adversarial logit. With ``verification=True`` the pyramid splits below
``verification_res_split`` (default size/4) into two parallel tails; the
second tail ends in a 128-d verification embedding (:949-965, 983-999).

TPU-first: flax.linen, NHWC activations; the pyramid is an unrolled Python
loop at trace time (static depth), so XLA sees one straight-line graph it can
fuse and tile for the MXU.
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp

from gan_control_tpu.models.blocks import (
    ConvLayer,
    EqualLinear,
    ResBlock,
    minibatch_stddev,
)
from gan_control_tpu.models.generator import channel_table


class DiscriminatorHead(nn.Module):
    """minibatch-stddev -> 3x3 conv -> flatten -> MLP -> out_dim.

    Reference: Discriminator._forward_split (models/gan_model.py:1003-1016).
    """

    mid_channels: int
    out_dim: int
    stddev_group: int = 4
    stddev_feat: int = 1

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = minibatch_stddev(x, self.stddev_group, self.stddev_feat)
        x = ConvLayer(self.mid_channels, 3, name="final_conv")(x)
        x = x.reshape(x.shape[0], -1)
        x = EqualLinear(self.mid_channels, activation="fused_lrelu", name="fc0")(x)
        x = EqualLinear(self.out_dim, name="fc1")(x)
        return x


class Discriminator(nn.Module):
    """See module docstring. Returns ``(adv_logit [B,1], ver_emb [B,128]|None)``."""

    size: int
    channel_multiplier: float = 2.0
    max_channels: int = 512
    blur_kernel: tuple = (1, 3, 3, 1)
    in_channels: int = 3
    verification: bool = False
    verification_res_split: int | None = None
    verification_dim: int = 128
    model_mode: str = "normal"
    # compute dtype of the pyramid (params stay float32; the blocks follow
    # the activation dtype). Logits are returned in float32 so the GAN
    # losses and R1 stay full-precision.
    dtype: jnp.dtype = jnp.float32
    # rematerialize each ResBlock in the backward pass: peak activation
    # memory drops from the whole-pyramid sum to one block (enables
    # batch 16/chip at 512² — the reference fit only 4/GPU)
    remat: bool = False

    @nn.compact
    def __call__(self, x: jax.Array):
        block_cls = nn.remat(ResBlock) if self.remat else ResBlock
        channels = channel_table(self.channel_multiplier, self.max_channels)
        log_size = int(math.log2(self.size))
        res_split = (
            self.size // 4
            if self.verification_res_split is None
            else self.verification_res_split
        )

        x = ConvLayer(channels[self.size], 1, name="from_rgb")(x.astype(self.dtype))

        shared = x
        split_blocks = []  # (res, out_channel, overwrite_padding) below the split
        bi = 0
        for i in range(log_size, 2, -1):
            res = 2 ** (i - 1)
            out_ch = channels[res]
            overwrite_padding = None
            if self.model_mode == "896":
                if res == 32:
                    overwrite_padding = 1.0
                elif res == 16:
                    overwrite_padding = 1.5
            if self.verification and res < res_split:
                split_blocks.append((out_ch, overwrite_padding))
            else:
                shared = block_cls(
                    out_ch,
                    blur_kernel=self.blur_kernel,
                    overwrite_padding=overwrite_padding,
                    name=f"block{bi}",
                )(shared)
                bi += 1

        adv = shared
        for j, (out_ch, opad) in enumerate(split_blocks):
            adv = block_cls(
                out_ch,
                blur_kernel=self.blur_kernel,
                overwrite_padding=opad,
                name=f"adv_block{j}",
            )(adv)
        adv_logit = DiscriminatorHead(channels[4], 1, name="adv_head")(adv)
        adv_logit = adv_logit.astype(jnp.float32)

        if not self.verification:
            return adv_logit, None

        ver = shared
        for j, (out_ch, opad) in enumerate(split_blocks):
            ver = block_cls(
                out_ch,
                blur_kernel=self.blur_kernel,
                overwrite_padding=opad,
                name=f"ver_block{j}",
            )(ver)
        ver_emb = DiscriminatorHead(
            channels[4], self.verification_dim, name="ver_head"
        )(ver)
        return adv_logit, ver_emb.astype(jnp.float32)
