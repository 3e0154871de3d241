"""Deep3DFaceRecon R-Net — 3DMM coefficient predictor (recon_3d_loss and
its 7 sub-losses: id/ex/tex/angles/gamma/xy/z).

Behavior contract (reference losses/face3dmm_recon/):
  - preprocessing (face3dmm_skeleton.py:23-31): RGB -> BGR, [-1,1] ->
    [0,255], optional center_crop, bicubic resize to 224
    (align_corners=True).
  - architecture (models/pytorch_3d_recon_model.py, a TF-graph conversion
    of resnet_v1_50): 7x7/2 stem (BN eps 1.001e-5), TF-pad (0,1) maxpool,
    4 blocks of bottlenecks in TF-v1 style — projection unit first
    (stride 1), identity units, STRIDE-2 LAST unit per block (EndBlock,
    maxpool(1,2) shortcut) except block4; global avg pool; 7 parallel
    1x1-conv heads with an extra additive bias parameter (TfFcBlock),
    concatenated to a 257-d coefficient vector.
  - coefficient split (skeleton:35-38): id[0:80) ex[80:144) tex[144:224)
    angles[224:227) gamma[227:254) xy[254:256) z[256:257).
  - criterion: pairwise mean-|diff| (face3dmm_criterion.py:15-22);
    controller_criterion: L1.

Weights: the converted .pt state_dict (config model_path)."""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from gan_control_tpu.losses.contrastive import pairwise_l1
from gan_control_tpu.losses.predictors.common import (
    Conv,
    FrozenBatchNorm,
    center_crop,
    resize_bicubic,
)
from gan_control_tpu.losses.predictors.resnet import bn_params, conv_w

BN_EPS = 1.001e-5

FEATURE_SLICES = {
    "id": (0, 80),
    "ex": (80, 144),
    "tex": (144, 224),
    "angles": (224, 227),
    "gamma": (227, 254),
    "xy": (254, 256),
    "z": (256, 257),
}

HEADS = (("id", 80), ("ex", 64), ("tex", 80), ("angles", 3), ("gamma", 27),
         ("xy", 2), ("z", 1))

# (mid_planes, out_planes, num_mid_units, has_end_block)
BLOCKS = ((64, 256, 1, True), (128, 512, 2, True), (256, 1024, 4, True),
          (512, 2048, 2, False))


class StartUnit(nn.Module):
    """Projection bottleneck, stride 1 (StartBlock, :203-229)."""

    mid: int
    out: int

    @nn.compact
    def __call__(self, x):
        r = jax.nn.relu(FrozenBatchNorm(self.mid, BN_EPS, name="bn1")(
            Conv(self.mid, 1, use_bias=False, name="conv1")(x)))
        r = jax.nn.relu(FrozenBatchNorm(self.mid, BN_EPS, name="bn2")(
            Conv(self.mid, 3, padding=1, use_bias=False, name="conv2")(r)))
        r = FrozenBatchNorm(self.out, BN_EPS, name="bn3")(
            Conv(self.out, 1, use_bias=False, name="conv3")(r))
        s = FrozenBatchNorm(self.out, BN_EPS, name="bn_shortcut")(
            Conv(self.out, 1, use_bias=False, name="conv_shortcut")(x))
        return jax.nn.relu(r + s)


class MidUnit(nn.Module):
    """Identity bottleneck (MidBlock, :232-254)."""

    mid: int
    out: int

    @nn.compact
    def __call__(self, x):
        r = jax.nn.relu(FrozenBatchNorm(self.mid, BN_EPS, name="bn1")(
            Conv(self.mid, 1, use_bias=False, name="conv1")(x)))
        r = jax.nn.relu(FrozenBatchNorm(self.mid, BN_EPS, name="bn2")(
            Conv(self.mid, 3, padding=1, use_bias=False, name="conv2")(r)))
        r = FrozenBatchNorm(self.out, BN_EPS, name="bn3")(
            Conv(self.out, 1, use_bias=False, name="conv3")(r))
        return jax.nn.relu(r + x)


class EndUnit(nn.Module):
    """Stride-2 bottleneck with maxpool(1,2) shortcut (EndBlock, :256-298)."""

    mid: int
    out: int

    @nn.compact
    def __call__(self, x):
        r = jax.nn.relu(FrozenBatchNorm(self.mid, BN_EPS, name="bn1")(
            Conv(self.mid, 1, use_bias=False, name="conv1")(x)))
        r = jax.nn.relu(FrozenBatchNorm(self.mid, BN_EPS, name="bn2")(
            Conv(self.mid, 3, stride=2, padding=1, use_bias=False, name="conv2")(r)))
        r = FrozenBatchNorm(self.out, BN_EPS, name="bn3")(
            Conv(self.out, 1, use_bias=False, name="conv3")(r))
        s = x[:, ::2, ::2, :]
        return jax.nn.relu(r + s)


class ReconNet(nn.Module):
    """Returns the 257-d coefficient vector."""

    @nn.compact
    def __call__(self, x):
        x = Conv(64, 7, stride=2, padding=3, use_bias=False, name="conv1")(x)
        x = jax.nn.relu(FrozenBatchNorm(64, BN_EPS, name="bn1")(x))
        # TF asymmetric pad (0,1)x(0,1) + maxpool 3/2 valid (:346-348)
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)), constant_values=-np.inf)
        x = jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1), "VALID"
        )
        for b, (mid, out, n_mid, has_end) in enumerate(BLOCKS):
            x = StartUnit(mid, out, name=f"block{b + 1}_unit1")(x)
            for u in range(n_mid):
                x = MidUnit(mid, out, name=f"block{b + 1}_unit{u + 2}")(x)
            if has_end:
                x = EndUnit(mid, out, name=f"block{b + 1}_unit{n_mid + 2}")(x)
        x = jnp.mean(x, axis=(1, 2), keepdims=True)  # [B,1,1,2048]
        outs = []
        for name, dim in HEADS:
            h = Conv(dim, 1, name=f"head_{name}")(x)[:, 0, 0, :]
            extra = self.param(f"head_{name}_add", nn.initializers.ones, (dim,))
            outs.append(h + extra.astype(h.dtype))
        return jnp.concatenate(outs, axis=1)  # [B, 257]


@dataclasses.dataclass(frozen=True)
class ReconModel:
    module: ReconNet
    center_crop: int | None


def make_model(config: dict) -> ReconModel:
    return ReconModel(module=ReconNet(), center_crop=config.get("center_crop"))


def init_params(model: ReconModel, rng: jax.Array):
    return model.module.init(rng, jnp.zeros((1, 224, 224, 3)))


def preprocess(model: ReconModel, images: jax.Array) -> jax.Array:
    x = images[..., ::-1]  # RGB -> BGR
    x = (x * 0.5 + 0.5) * 255.0
    if x.shape[1] != 224:
        if model.center_crop is not None and x.shape[1] > model.center_crop:
            x = center_crop(x, model.center_crop)
        x = resize_bicubic(x, (224, 224), align_corners=True)
    return x


def features(model: ReconModel, params, images: jax.Array):
    # backbone at the caller's dtype; preprocess upcasts via f32 constants
    return [
        model.module.apply(
            params, preprocess(model, images).astype(images.dtype)
        )
    ]


def extract_feature(vec: jax.Array, which: str) -> jax.Array:
    s, e = FEATURE_SLICES[which]
    return vec[:, s:e]


def last_layer_dist(vec: jax.Array) -> jax.Array:
    return pairwise_l1(vec)


def predict(model: ReconModel, params, images: jax.Array) -> jax.Array:
    return features(model, params, images)[-1]


def controller_criterion(pred: jax.Array, target: jax.Array) -> jax.Array:
    return jnp.mean(jnp.abs(pred - target))


def convert_torch_weights(model: ReconModel, path: str):
    import torch

    sd = torch.load(path, map_location="cpu")
    p: dict = {
        "conv1": {"weight": conv_w(sd["conv1.weight"])},
        "bn1": bn_params(sd, "bn1"),
    }
    unit_kinds = []
    for b, (mid, out, n_mid, has_end) in enumerate(BLOCKS):
        units = ["unit_1"] + [f"unit_{i + 2}" for i in range(n_mid)]
        if has_end:
            units.append(f"unit_{n_mid + 2}")
        for u, uname in enumerate(units):
            t = f"block{b + 1}.{uname}"
            blk = {}
            for c in range(1, 4):
                blk[f"conv{c}"] = {"weight": conv_w(sd[f"{t}.conv{c}.weight"])}
                blk[f"bn{c}"] = bn_params(sd, f"{t}.bn{c}")
            if f"{t}.conv_shortcut.weight" in sd:
                blk["conv_shortcut"] = {"weight": conv_w(sd[f"{t}.conv_shortcut.weight"])}
                blk["bn_shortcut"] = bn_params(sd, f"{t}.bn_shortcut")
            p[f"block{b + 1}_unit{u + 1}"] = blk
    for name, dim in HEADS:
        p[f"head_{name}"] = {
            "weight": conv_w(sd[f"{name}.tf_fc.weight"]),
            "bias": np.asarray(sd[f"{name}.tf_fc.bias"]),
        }
        p[f"head_{name}_add"] = np.asarray(sd[f"{name}.add_bais"])
    return {"params": jax.tree_util.tree_map(jnp.asarray, p)}
