"""StyleGAN2-class Generator with a disentangled (per-attribute) mapping
network — flax.linen, NHWC, TPU-first.

Behavior contract: Generator in reference models/gan_model.py:505-811 —
channels dict (:552-563), mapping variants regular/split/marge/VAE
(:534-550), constant input + conv1 + to_rgb1 + per-resolution (conv, conv,
ToRGB-skip) pyramid (:565-614), noise modes, truncation lerp (:744-752),
style mixing by inject_index (:754-769), n_latent = 2*log2(size)-2 (:616).

TPU-first differences:
  - pure functional forward; injection noise comes either from an explicit
    list, from the 'noises' variable collection (randomize_noise=False), or
    from the 'noise' PRNG stream (randomize_noise=True);
  - style mixing uses a traced layer-index mask, so inject_index can be a
    per-step scalar without recompilation;
  - the path-length regularizer is jax.grad of this forward in the trainer —
    no DataParallel-style `return_grad` plumbing is needed.
"""

from __future__ import annotations

import math
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from gan_control_tpu.models.blocks import (
    ConstantInput,
    EqualLinear,
    StyledConv,
    ToRGB,
    pixel_norm,
)


def channel_table(
    channel_multiplier: float = 2.0, max_channels: int = 512
) -> dict[int, int]:
    """Per-resolution channel widths (reference: models/gan_model.py:552-563).

    ``max_channels`` caps the low-resolution plateau (512 in the reference);
    tests use a small cap so 'tiny' models are actually tiny."""
    table = {
        4: 512,
        8: 512,
        16: 512,
        32: 512,
        64: int(256 * channel_multiplier),
        128: int(128 * channel_multiplier),
        256: int(64 * channel_multiplier),
        512: int(32 * channel_multiplier),
        1024: int(16 * channel_multiplier),
        1344: int(16 * channel_multiplier),
    }
    return {k: min(v, max_channels) for k, v in table.items()}


class RegularMapping(nn.Module):
    """PixelNorm + n_mlp equalized MLP layers (reference :633-642)."""

    style_dim: int
    n_mlp: int
    lr_mlp: float = 0.01

    @nn.compact
    def __call__(self, z: jax.Array) -> jax.Array:
        x = pixel_norm(z)
        for i in range(self.n_mlp):
            x = EqualLinear(
                self.style_dim, lr_mul=self.lr_mlp, activation="fused_lrelu",
                name=f"fc{i}",
            )(x)
        return x


class GroupMapping(nn.Module):
    """Per-attribute MLP stack: group_size -> mid_dim -> ... -> group_size.

    Reference: Generator.create_fc_stack (:658-681), mid_dim=256.
    """

    out_dim: int
    n_mlp: int
    mid_dim: int = 256
    lr_mlp: float = 0.01

    @nn.compact
    def __call__(self, z: jax.Array) -> jax.Array:
        x = pixel_norm(z)
        for i in range(self.n_mlp):
            if i == 0:
                feats = self.mid_dim if self.n_mlp > 1 else self.out_dim
            elif i < self.n_mlp - 1:
                feats = self.mid_dim
            else:
                feats = self.out_dim
            x = EqualLinear(
                feats, lr_mul=self.lr_mlp, activation="fused_lrelu", name=f"fc{i}"
            )(x)
        return x


class SplitMapping(nn.Module):
    """The disentangled mapping: one GroupMapping per latent group, applied
    to that group's slice of z, concatenated back to style_dim.

    Reference: MultiFcStack (:489-502) built by make_fc_stacks_using_fc_config
    (:619-630). `fc_groups` is a static tuple of (name, latent_size).
    """

    fc_groups: tuple  # ((name, size), ...) ordered by latent offset
    n_mlp: int
    lr_mlp: float = 0.01

    @nn.compact
    def __call__(self, z: jax.Array) -> jax.Array:
        outs = []
        offset = 0
        for name, size in self.fc_groups:
            piece = z[..., offset : offset + size]
            outs.append(
                GroupMapping(size, self.n_mlp, lr_mlp=self.lr_mlp, name=name)(piece)
            )
            offset += size
        return jnp.concatenate(outs, axis=-1)


class VAEMapping(nn.Module):
    """VAE-style embedding alternative (reference: VAE, :438-474; the
    reference hardcodes 512 — parameterized here by style_dim)."""

    bottleneck_size: int = 256
    lr_mlp: float = 0.01
    style_dim: int = 512

    def setup(self):
        kw = dict(lr_mul=self.lr_mlp, activation="fused_lrelu")
        self.shared_in = [EqualLinear(self.style_dim, **kw) for _ in range(3)]
        self.to_mu = EqualLinear(self.bottleneck_size, **kw)
        self.to_sigma = EqualLinear(self.bottleneck_size, **kw)
        self.to_sample = EqualLinear(self.style_dim, **kw)
        self.shared_out = [EqualLinear(self.style_dim, **kw) for _ in range(3)]

    def encode(self, x):
        for layer in self.shared_in:
            x = layer(x)
        return self.to_mu(x), self.to_sigma(x)

    def decode(self, z):
        h = self.to_sample(z)
        for layer in self.shared_out:
            h = layer(h)
        return jax.nn.sigmoid(h)

    def __call__(self, x):
        mu, logvar = self.encode(x)
        std = jnp.exp(0.5 * logvar)
        eps = jax.random.normal(self.make_rng("noise"), std.shape, std.dtype)
        return self.decode(mu + eps * std), mu, logvar


class Generator(nn.Module):
    """See module docstring. All config fields are static."""

    size: int
    style_dim: int = 512
    n_mlp: int = 8
    channel_multiplier: float = 2.0
    max_channels: int = 512
    blur_kernel: tuple = (1, 3, 3, 1)
    lr_mlp: float = 0.01
    out_channels: int = 3
    vae: bool = False
    bottleneck_size: int = 256
    split_fc: bool = False
    marge_fc: bool = False
    fc_groups: tuple | None = None  # ((name, latent_size), ...)
    model_mode: str = "normal"
    noise_mode: str = "normal"
    dtype: jnp.dtype = jnp.float32
    # rematerialize each synthesis conv in the backward (memory plan for
    # large per-chip batches; see Discriminator.remat)
    remat: bool = False

    @property
    def log_size(self) -> int:
        return int(math.log2(self.size))

    @property
    def num_layers(self) -> int:
        return (self.log_size - 2) * 2 + 1

    @property
    def n_latent(self) -> int:
        return self.log_size * 2 - 2

    # -- submodule construction ------------------------------------------------

    def setup(self):
        channels = channel_table(self.channel_multiplier, self.max_channels)

        if self.vae:
            self.style = VAEMapping(self.bottleneck_size, self.lr_mlp, self.style_dim)
        elif self.split_fc:
            assert self.fc_groups, "split_fc requires fc_groups"
            self.style = SplitMapping(self.fc_groups, self.n_mlp, self.lr_mlp)
        elif self.marge_fc:
            assert self.fc_groups, "marge_fc requires fc_groups"
            self.style_split = SplitMapping(
                self.fc_groups, int(math.ceil(self.n_mlp / 2)), self.lr_mlp
            )
            self.style_shared = RegularMapping(
                self.style_dim, int(math.floor(self.n_mlp / 2)), self.lr_mlp
            )
        else:
            self.style = RegularMapping(self.style_dim, self.n_mlp, self.lr_mlp)

        self.input = ConstantInput(channels[4])
        self.conv1 = StyledConv(
            channels[4], 3, blur_kernel=self.blur_kernel, noise_mode=self.noise_mode
        )
        self.to_rgb1 = ToRGB(self.out_channels, upsample=False)

        styled_conv = nn.remat(StyledConv) if self.remat else StyledConv
        convs = []
        to_rgbs = []
        for i in range(3, self.log_size + 1):
            out_ch = channels[2**i]
            convs.append(
                styled_conv(
                    out_ch, 3, upsample=True, blur_kernel=self.blur_kernel,
                    noise_mode=self.noise_mode,
                )
            )
            overwrite_padding = None
            overwrite_negative_padding = None
            if self.model_mode == "896" and 2**i == 16:
                overwrite_padding = 0
                overwrite_negative_padding = -1
            # the reference passes noise_mode only to conv1 and the
            # UPSAMPLE convs; the second conv of each pair keeps the
            # default 'normal' injection (gan_model.py:606-610)
            convs.append(
                styled_conv(
                    out_ch, 3, blur_kernel=self.blur_kernel,
                    overwrite_padding=overwrite_padding,
                )
            )
            to_rgbs.append(
                ToRGB(
                    self.out_channels,
                    overwrite_negative_padding=overwrite_negative_padding,
                )
            )
        self.convs = convs
        self.to_rgbs = to_rgbs

    # -- public API --------------------------------------------------------------

    def map_latent(self, z: jax.Array) -> jax.Array:
        """z -> w (the reference's `get_latent`/`G.style`, :706-707).

        In VAE mode mu/logvar are sown into the 'intermediates' collection
        (keys vae_mu / vae_logvar) — the reference stashes them on the
        module (self.mu/self.logvar, :734-735) for the KL term; retrieve
        with ``apply(..., mutable=["intermediates"])`` or use
        :meth:`map_latent_vae` directly."""
        if self.vae:
            w, mu, logvar = self.style(z)
            self.sow("intermediates", "vae_mu", mu)
            self.sow("intermediates", "vae_logvar", logvar)
            return w
        if self.marge_fc:
            return self.style_shared(self.style_split(z))
        return self.style(z)

    def map_latent_vae(self, z: jax.Array):
        """z -> (w, mu, logvar) — the VAE objective's KL inputs (reference
        gan_model.py:734-735)."""
        if not self.vae:
            raise ValueError("map_latent_vae requires vae=True")
        return self.style(z)

    def noise_shapes(self, batch: int = 1) -> list[tuple[int, int, int, int]]:
        """Injection-noise shapes per layer, NHWC (reference make_noise
        :683-696 incl. the '896' 14*2^k ladder)."""
        shapes = [(batch, 4, 4, 1)]
        for i in range(3, self.log_size + 1):
            for inter in range(2):
                if self.model_mode == "896" and (i > 4 or (i == 4 and inter > 0)):
                    s = 14 * (2 ** (i - 4))
                else:
                    s = 2**i
                shapes.append((batch, s, s, 1))
        return shapes

    def __call__(
        self,
        styles: Sequence[jax.Array],
        *,
        return_latents: bool = False,
        inject_index: jax.Array | int | None = None,
        truncation: float | jax.Array = 1.0,
        truncation_latent: jax.Array | None = None,
        input_is_latent: bool = False,
        noise: Sequence[jax.Array] | None = None,
        randomize_noise: bool = True,
    ):
        """Forward. Returns (image NHWC in [-1,1]-ish, w+ latent or None)."""
        if not input_is_latent:
            styles = [self.map_latent(s) for s in styles]

        if truncation_latent is not None:
            styles = [
                truncation_latent + truncation * (s - truncation_latent) for s in styles
            ]
        elif not (isinstance(truncation, (int, float)) and truncation == 1):
            # the reference raises (None + tensor) rather than silently
            # sampling at psi=1 (gan_model.py:744-752)
            raise ValueError(
                "truncation != 1 requires truncation_latent (mean_latent)"
            )

        # Build w+ [B, n_latent, style_dim]
        if len(styles) < 2:
            if styles[0].ndim < 3:
                latent = jnp.repeat(styles[0][:, None, :], self.n_latent, axis=1)
            else:
                latent = styles[0]
        else:
            if inject_index is None:
                # reference: random.randint(1, n_latent - 1) per call
                # (gan_model.py:763-764); draw from the 'noise' rng stream
                # when available, else fall back to the midpoint
                if self.has_rng("noise"):
                    inject_index = jax.random.randint(
                        self.make_rng("noise"), (), 1, self.n_latent
                    )
                else:
                    inject_index = self.n_latent // 2
            layer_ids = jnp.arange(self.n_latent)[None, :, None]
            w0 = styles[0][:, None, :]
            w1 = styles[1][:, None, :]
            latent = jnp.where(layer_ids < inject_index, w0, w1)

        if noise is None:
            if randomize_noise:
                noise = [None] * self.num_layers
            else:
                noise = []
                for li, shape in enumerate(self.noise_shapes(1)):
                    var = self.variable(
                        "noises",
                        f"noise_{li}",
                        lambda s=shape: jax.random.normal(
                            self.make_rng("params") if self.is_initializing() else jax.random.PRNGKey(li),
                            s,
                            jnp.float32,
                        ),
                    )
                    noise.append(var.value)

        out = self.input(latent.shape[0]).astype(self.dtype)
        out = self.conv1(out, latent[:, 0], noise=noise[0])
        skip = self.to_rgb1(out, latent[:, 1])

        i = 1
        for idx in range(len(self.to_rgbs)):
            conv_a = self.convs[2 * idx]
            conv_b = self.convs[2 * idx + 1]
            out = conv_a(out, latent[:, i], noise=noise[2 * idx + 1])
            out = conv_b(out, latent[:, i + 1], noise=noise[2 * idx + 2])
            skip = self.to_rgbs[idx](out, latent[:, i + 2], skip)
            i += 2

        image = skip
        if return_latents:
            return image, latent
        return image, None


def mean_latent(
    generator: Generator, params, rng: jax.Array, n_latent: int, style_dim: int = 512
) -> jax.Array:
    """Average w over n_latent random z (reference: mean_latent, :698-704)."""
    z = jax.random.normal(rng, (n_latent, style_dim))
    w = generator.apply(params, z, method=Generator.map_latent)
    return jnp.mean(w, axis=0, keepdims=True)
