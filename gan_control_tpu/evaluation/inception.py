"""InceptionV3 (pytorch-fid variant) for FID feature extraction — flax.

Stats contract (reference fid_utils/inception.py, a pytorch-fid port):
  - input [0,1] RGB, bilinear resize to 299 (align_corners=False),
    normalized to [-1,1];
  - torchvision inception_v3 trunk with pytorch-fid's pooling patches
    (FIDInceptionA/C/E_1 use avg-pool with count_include_pad=False — equal
    to plain window-mean away from borders, corrected here the same way;
    FIDInceptionE_2's pool branch uses MAX pooling, matching the original
    TF graph);
  - the FID feature is the 2048-d global-average 'pool3' activation.

All convs are conv(no bias) + BN(eps=1e-3) + relu. The weight converter
accepts a torchvision/pytorch-fid state_dict."""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from gan_control_tpu.losses.predictors.common import (
    Conv,
    FrozenBatchNorm,
    max_pool,
    resize_bilinear,
)


class BasicConv(nn.Module):
    features: int
    kernel_size: int | tuple = 1
    stride: int = 1
    padding: int | tuple = 0

    @nn.compact
    def __call__(self, x):
        x = Conv(self.features, self.kernel_size, self.stride, self.padding,
                 use_bias=False, name="conv")(x)
        x = FrozenBatchNorm(self.features, eps=1e-3, name="bn")(x)
        return jax.nn.relu(x)


def _avg_pool_3x3_no_pad_count(x):
    """avg_pool2d(3, stride 1, pad 1, count_include_pad=False)."""
    ones = jnp.ones(x.shape[:3] + (1,), x.dtype)
    pads = ((0, 0), (1, 1), (1, 1), (0, 0))
    s = jax.lax.reduce_window(x, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1), pads)
    cnt = jax.lax.reduce_window(ones, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1), pads)
    return s / cnt


class InceptionA(nn.Module):
    pool_features: int

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv(64, 1, name="branch1x1")(x)
        b5 = BasicConv(48, 1, name="branch5x5_1")(x)
        b5 = BasicConv(64, 5, padding=2, name="branch5x5_2")(b5)
        b3 = BasicConv(64, 1, name="branch3x3dbl_1")(x)
        b3 = BasicConv(96, 3, padding=1, name="branch3x3dbl_2")(b3)
        b3 = BasicConv(96, 3, padding=1, name="branch3x3dbl_3")(b3)
        bp = _avg_pool_3x3_no_pad_count(x)
        bp = BasicConv(self.pool_features, 1, name="branch_pool")(bp)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv(384, 3, stride=2, name="branch3x3")(x)
        bd = BasicConv(64, 1, name="branch3x3dbl_1")(x)
        bd = BasicConv(96, 3, padding=1, name="branch3x3dbl_2")(bd)
        bd = BasicConv(96, 3, stride=2, name="branch3x3dbl_3")(bd)
        bp = max_pool(x, 3, 2)
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    c7: int

    @nn.compact
    def __call__(self, x):
        c7 = self.c7
        b1 = BasicConv(192, 1, name="branch1x1")(x)
        b7 = BasicConv(c7, 1, name="branch7x7_1")(x)
        b7 = BasicConv(c7, (1, 7), padding=(0, 3), name="branch7x7_2")(b7)
        b7 = BasicConv(192, (7, 1), padding=(3, 0), name="branch7x7_3")(b7)
        bd = BasicConv(c7, 1, name="branch7x7dbl_1")(x)
        bd = BasicConv(c7, (7, 1), padding=(3, 0), name="branch7x7dbl_2")(bd)
        bd = BasicConv(c7, (1, 7), padding=(0, 3), name="branch7x7dbl_3")(bd)
        bd = BasicConv(c7, (7, 1), padding=(3, 0), name="branch7x7dbl_4")(bd)
        bd = BasicConv(192, (1, 7), padding=(0, 3), name="branch7x7dbl_5")(bd)
        bp = _avg_pool_3x3_no_pad_count(x)
        bp = BasicConv(192, 1, name="branch_pool")(bp)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv(192, 1, name="branch3x3_1")(x)
        b3 = BasicConv(320, 3, stride=2, name="branch3x3_2")(b3)
        b7 = BasicConv(192, 1, name="branch7x7x3_1")(x)
        b7 = BasicConv(192, (1, 7), padding=(0, 3), name="branch7x7x3_2")(b7)
        b7 = BasicConv(192, (7, 1), padding=(3, 0), name="branch7x7x3_3")(b7)
        b7 = BasicConv(192, 3, stride=2, name="branch7x7x3_4")(b7)
        bp = max_pool(x, 3, 2)
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    pool_mode: str = "avg"  # 'avg' (E_1) or 'max' (E_2, the TF-parity patch)

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv(320, 1, name="branch1x1")(x)
        b3 = BasicConv(384, 1, name="branch3x3_1")(x)
        b3a = BasicConv(384, (1, 3), padding=(0, 1), name="branch3x3_2a")(b3)
        b3b = BasicConv(384, (3, 1), padding=(1, 0), name="branch3x3_2b")(b3)
        b3 = jnp.concatenate([b3a, b3b], axis=-1)
        bd = BasicConv(448, 1, name="branch3x3dbl_1")(x)
        bd = BasicConv(384, 3, padding=1, name="branch3x3dbl_2")(bd)
        bda = BasicConv(384, (1, 3), padding=(0, 1), name="branch3x3dbl_3a")(bd)
        bdb = BasicConv(384, (3, 1), padding=(1, 0), name="branch3x3dbl_3b")(bd)
        bd = jnp.concatenate([bda, bdb], axis=-1)
        if self.pool_mode == "max":
            bp = max_pool(x, 3, 1, padding=1)
        else:
            bp = _avg_pool_3x3_no_pad_count(x)
        bp = BasicConv(192, 1, name="branch_pool")(bp)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3Features(nn.Module):
    """[0,1] RGB NHWC (any size) -> 2048-d pool3 features."""

    @nn.compact
    def __call__(self, x):
        if x.shape[1] != 299:
            x = resize_bilinear(x, (299, 299), align_corners=False)
        x = x * 2.0 - 1.0
        x = BasicConv(32, 3, stride=2, name="Conv2d_1a_3x3")(x)
        x = BasicConv(32, 3, name="Conv2d_2a_3x3")(x)
        x = BasicConv(64, 3, padding=1, name="Conv2d_2b_3x3")(x)
        x = max_pool(x, 3, 2)
        x = BasicConv(80, 1, name="Conv2d_3b_1x1")(x)
        x = BasicConv(192, 3, name="Conv2d_4a_3x3")(x)
        x = max_pool(x, 3, 2)
        x = InceptionA(32, name="Mixed_5b")(x)
        x = InceptionA(64, name="Mixed_5c")(x)
        x = InceptionA(64, name="Mixed_5d")(x)
        x = InceptionB(name="Mixed_6a")(x)
        x = InceptionC(128, name="Mixed_6b")(x)
        x = InceptionC(160, name="Mixed_6c")(x)
        x = InceptionC(160, name="Mixed_6d")(x)
        x = InceptionC(192, name="Mixed_6e")(x)
        x = InceptionD(name="Mixed_7a")(x)
        x = InceptionE("avg", name="Mixed_7b")(x)
        x = InceptionE("max", name="Mixed_7c")(x)
        return jnp.mean(x, axis=(1, 2))  # [B, 2048]


def init_params(rng: jax.Array):
    return InceptionV3Features().init(rng, jnp.zeros((1, 299, 299, 3)))


def convert_torch_weights(path_or_sd):
    """torchvision/pytorch-fid inception_v3 state_dict -> flax params."""
    import torch

    from gan_control_tpu.losses.predictors.resnet import bn_params, conv_w

    sd = (
        torch.load(path_or_sd, map_location="cpu")
        if isinstance(path_or_sd, str)
        else path_or_sd
    )

    def basic(prefix):
        return {
            "conv": {"weight": conv_w(sd[f"{prefix}.conv.weight"])},
            "bn": bn_params(sd, f"{prefix}.bn"),
        }

    p: dict = {}
    for stem in ("Conv2d_1a_3x3", "Conv2d_2a_3x3", "Conv2d_2b_3x3",
                 "Conv2d_3b_1x1", "Conv2d_4a_3x3"):
        p[stem] = basic(stem)

    def convert_block(name, branch_names):
        blk = {}
        for b in branch_names:
            blk[b] = basic(f"{name}.{b}")
        p[name] = blk

    for name in ("Mixed_5b", "Mixed_5c", "Mixed_5d"):
        convert_block(name, ("branch1x1", "branch5x5_1", "branch5x5_2",
                             "branch3x3dbl_1", "branch3x3dbl_2",
                             "branch3x3dbl_3", "branch_pool"))
    convert_block("Mixed_6a", ("branch3x3", "branch3x3dbl_1",
                               "branch3x3dbl_2", "branch3x3dbl_3"))
    for name in ("Mixed_6b", "Mixed_6c", "Mixed_6d", "Mixed_6e"):
        convert_block(name, ("branch1x1", "branch7x7_1", "branch7x7_2",
                             "branch7x7_3", "branch7x7dbl_1", "branch7x7dbl_2",
                             "branch7x7dbl_3", "branch7x7dbl_4",
                             "branch7x7dbl_5", "branch_pool"))
    convert_block("Mixed_7a", ("branch3x3_1", "branch3x3_2", "branch7x7x3_1",
                               "branch7x7x3_2", "branch7x7x3_3", "branch7x7x3_4"))
    for name in ("Mixed_7b", "Mixed_7c"):
        convert_block(name, ("branch1x1", "branch3x3_1", "branch3x3_2a",
                             "branch3x3_2b", "branch3x3dbl_1", "branch3x3dbl_2",
                             "branch3x3dbl_3a", "branch3x3dbl_3b", "branch_pool"))
    return {"params": jax.tree_util.tree_map(jnp.asarray, p)}
