"""Phase-2 control encoder (FcStack).

Behavior contract: models/controller_model.py:13-53 — n_mlp EqualLinear
layers, dims in_dim -> mid_dim -> ... -> mid_dim -> out_dim, every layer
with the fused bias+leaky-relu activation; out_dim is the controlled
group's latent size. Maps a human-interpretable control value (e.g.
[yaw, pitch, roll], age in years, RGB hair color, 27-d SH gamma, 64-d 3DMM
expression, 8-d one-hot expression) to that group's w sub-latent."""

from __future__ import annotations

import flax.linen as nn
import jax

from gan_control_tpu.models.blocks import EqualLinear


class FcStack(nn.Module):
    n_mlp: int = 4
    mid_dim: int = 512
    out_dim: int = 512
    lr_mlp: float = 0.01

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        for i in range(self.n_mlp):
            feats = self.out_dim if i == self.n_mlp - 1 else self.mid_dim
            x = EqualLinear(
                feats, lr_mul=self.lr_mlp, activation="fused_lrelu", name=f"fc{i}"
            )(x)
        return x
