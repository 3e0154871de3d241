"""Shared frozen ResNet trunk (torchvision-v1.5-compatible) — used by the
Hopenet pose predictor (ResNet-50, hopenet_model.py:7-25), the Deep3DFace
R-Net (modified ResNet-50, face3dmm_recon/models/resnet.py) and the
imagenet classification predictor (resnet18).

NHWC/HWIO; BatchNorm frozen (inference stats as params). Includes the
state_dict converter for torchvision-style key naming."""

from __future__ import annotations

import flax.linen as nn
import jax
import numpy as np

from gan_control_tpu.losses.predictors.common import (
    Conv,
    FrozenBatchNorm,
    max_pool,
)


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    expansion: int = 1

    @nn.compact
    def __call__(self, x):
        identity = x
        out = Conv(self.planes, 3, stride=self.stride, padding=1, use_bias=False, name="conv1")(x)
        out = FrozenBatchNorm(self.planes, name="bn1")(out)
        out = jax.nn.relu(out)
        out = Conv(self.planes, 3, stride=1, padding=1, use_bias=False, name="conv2")(out)
        out = FrozenBatchNorm(self.planes, name="bn2")(out)
        if self.stride != 1 or x.shape[-1] != self.planes:
            identity = Conv(self.planes, 1, stride=self.stride, use_bias=False, name="down_conv")(x)
            identity = FrozenBatchNorm(self.planes, name="down_bn")(identity)
        return jax.nn.relu(out + identity)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    expansion: int = 4

    @nn.compact
    def __call__(self, x):
        out_ch = self.planes * self.expansion
        identity = x
        out = Conv(self.planes, 1, use_bias=False, name="conv1")(x)
        out = FrozenBatchNorm(self.planes, name="bn1")(out)
        out = jax.nn.relu(out)
        out = Conv(self.planes, 3, stride=self.stride, padding=1, use_bias=False, name="conv2")(out)
        out = FrozenBatchNorm(self.planes, name="bn2")(out)
        out = jax.nn.relu(out)
        out = Conv(out_ch, 1, use_bias=False, name="conv3")(out)
        out = FrozenBatchNorm(out_ch, name="bn3")(out)
        if self.stride != 1 or x.shape[-1] != out_ch:
            identity = Conv(out_ch, 1, stride=self.stride, use_bias=False, name="down_conv")(x)
            identity = FrozenBatchNorm(out_ch, name="down_bn")(identity)
        return jax.nn.relu(out + identity)


class ResNetTrunk(nn.Module):
    """conv7x7 stem + 4 stages; returns [stage1, stage2, stage3, stage4]."""

    layers: tuple = (3, 4, 6, 3)
    bottleneck: bool = True
    stem_width: int = 64

    @nn.compact
    def __call__(self, x):
        x = Conv(self.stem_width, 7, stride=2, padding=3, use_bias=False, name="conv1")(x)
        x = FrozenBatchNorm(self.stem_width, name="bn1")(x)
        x = jax.nn.relu(x)
        x = max_pool(x, 3, 2, padding=1)
        block = Bottleneck if self.bottleneck else BasicBlock
        outs = []
        for stage, n in enumerate(self.layers):
            planes = 64 * (2**stage)
            for b in range(n):
                stride = 2 if (stage > 0 and b == 0) else 1
                x = block(planes, stride, name=f"layer{stage + 1}_{b}")(x)
            outs.append(x)
        return outs


# ---------------------------------------------------------------------------
# torchvision-style state_dict conversion
# ---------------------------------------------------------------------------


def conv_w(t) -> np.ndarray:  # [O,I,kh,kw] -> [kh,kw,I,O]
    return np.transpose(np.asarray(t), (2, 3, 1, 0))


def bn_params(sd: dict, prefix: str) -> dict:
    return {
        "scale": np.asarray(sd[f"{prefix}.weight"]),
        "bias": np.asarray(sd[f"{prefix}.bias"]),
        "mean": np.asarray(sd[f"{prefix}.running_mean"]),
        "var": np.asarray(sd[f"{prefix}.running_var"]),
    }


def convert_trunk(sd: dict, layers: tuple, bottleneck: bool = True, prefix: str = "") -> dict:
    """torchvision resnet keys (conv1, bn1, layer{i}.{j}.*) -> flax tree."""
    n_convs = 3 if bottleneck else 2
    p: dict = {
        "conv1": {"weight": conv_w(sd[f"{prefix}conv1.weight"])},
        "bn1": bn_params(sd, f"{prefix}bn1"),
    }
    for stage, n in enumerate(layers):
        for b in range(n):
            t = f"{prefix}layer{stage + 1}.{b}"
            blk = {}
            for c in range(1, n_convs + 1):
                blk[f"conv{c}"] = {"weight": conv_w(sd[f"{t}.conv{c}.weight"])}
                blk[f"bn{c}"] = bn_params(sd, f"{t}.bn{c}")
            if f"{t}.downsample.0.weight" in sd:
                blk["down_conv"] = {"weight": conv_w(sd[f"{t}.downsample.0.weight"])}
                blk["down_bn"] = bn_params(sd, f"{t}.downsample.1")
            p[f"layer{stage + 1}_{b}"] = blk
    return p
