"""ArcFace IR-SE-50 — face-identity predictor (embedding_loss).

Behavior contract (reference losses/arc_face/):
  - architecture: Backbone(num_layers=50, mode='ir_se')
    (arc_face_model.py:104-140): input 3x3 conv + BN + PReLU; 4 stages of
    bottleneck_IR_SE units ([3,4,14,3] units, depths [64,128,256,512],
    stride-2 first unit per stage); output BN -> flatten -> Linear(512*7*7
    -> 512) -> BN1d; l2-normalized 512-d embedding.
  - skeleton forward (arc_face_skeleton.py:27-38): center_crop(480) when
    configured, bilinear resize to 112 with align_corners=True, returns
    [stage1, stage2, stage3, stage4, embedding].
  - criterion: squared-L2 pairwise matrix (arc_face_criterion.py:16-22).

Weights: one-time conversion from the reference's model_ir_se50.pth
(torch state_dict) — see convert_torch_weights."""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from gan_control_tpu.losses.contrastive import pairwise_sq_l2
from gan_control_tpu.losses.predictors.common import (
    Conv,
    Dense,
    FrozenBatchNorm,
    PReLU,
    center_crop,
    global_avg_pool,
    l2_normalize,
    resize_bilinear,
)

STAGES_50 = ((64, 3), (128, 4), (256, 14), (512, 3))  # (depth, num_units)


class SEModule(nn.Module):
    channels: int
    reduction: int = 16

    @nn.compact
    def __call__(self, x):
        a = global_avg_pool(x)
        a = Conv(self.channels // self.reduction, 1, use_bias=False, name="fc1")(a)
        a = jax.nn.relu(a)
        a = Conv(self.channels, 1, use_bias=False, name="fc2")(a)
        return x * jax.nn.sigmoid(a)


class BottleneckIRSE(nn.Module):
    depth: int
    stride: int

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        if in_ch == self.depth:
            shortcut = x[:, :: self.stride, :: self.stride, :]
        else:
            shortcut = Conv(
                self.depth, 1, stride=self.stride, use_bias=False, name="short_conv"
            )(x)
            shortcut = FrozenBatchNorm(self.depth, name="short_bn")(shortcut)
        r = FrozenBatchNorm(in_ch, name="bn0")(x)
        r = Conv(self.depth, 3, stride=1, padding=1, use_bias=False, name="conv1")(r)
        r = PReLU(self.depth, name="prelu")(r)
        r = Conv(self.depth, 3, stride=self.stride, padding=1, use_bias=False, name="conv2")(r)
        r = FrozenBatchNorm(self.depth, name="bn2")(r)
        r = SEModule(self.depth, name="se")(r)
        return r + shortcut


class ArcFaceBackbone(nn.Module):
    """IR-SE-50; returns [stage1, stage2, stage3, stage4, embedding]."""

    stages: tuple = STAGES_50

    @nn.compact
    def __call__(self, x):
        x = Conv(64, 3, stride=1, padding=1, use_bias=False, name="input_conv")(x)
        x = FrozenBatchNorm(64, name="input_bn")(x)
        x = PReLU(64, name="input_prelu")(x)

        outs = []
        b = 0
        for depth, units in self.stages:
            for u in range(units):
                x = BottleneckIRSE(depth, 2 if u == 0 else 1, name=f"block{b}")(x)
                b += 1
            outs.append(x)

        y = FrozenBatchNorm(512, name="out_bn")(x)
        y = y.reshape(y.shape[0], -1)  # NHWC flatten (h, w, c)
        y = Dense(512, name="out_fc")(y)
        y = FrozenBatchNorm(512, name="out_bn1d")(y)
        outs.append(l2_normalize(y, axis=-1))
        return outs


@dataclasses.dataclass(frozen=True)
class ArcFaceModel:
    module: ArcFaceBackbone
    center_crop: int | None


def make_model(config: dict) -> ArcFaceModel:
    return ArcFaceModel(
        module=ArcFaceBackbone(), center_crop=config.get("center_crop")
    )


def init_params(model: ArcFaceModel, rng: jax.Array):
    return model.module.init(rng, jnp.zeros((1, 112, 112, 3)))


def preprocess(model: ArcFaceModel, images: jax.Array) -> jax.Array:
    """[-1,1] NHWC generator output -> 112x112 network input
    (arc_face_skeleton.py:28-31)."""
    if images.shape[1] != 112:
        if model.center_crop is not None and images.shape[1] > model.center_crop:
            images = center_crop(images, model.center_crop)
        images = resize_bilinear(images, (112, 112), align_corners=True)
    return images


def features(model: ArcFaceModel, params, images: jax.Array):
    # backbone runs at the caller's dtype (bf16 battery support): preprocess
    # may upcast via f32 constants, so re-assert the incoming dtype here
    return model.module.apply(
        params, preprocess(model, images).astype(images.dtype)
    )


def last_layer_dist(emb: jax.Array) -> jax.Array:
    return pairwise_sq_l2(emb)


def predict(model: ArcFaceModel, params, images: jax.Array) -> jax.Array:
    """The embedding itself (used by make_attributes_df's arcface_emb column)."""
    return features(model, params, images)[-1]


def controller_criterion(pred: jax.Array, target: jax.Array) -> jax.Array:
    return jnp.mean(jnp.square(pred - target))


# ---------------------------------------------------------------------------
# torch -> flax weight conversion
# ---------------------------------------------------------------------------


def _conv_w(t):  # [O,I,kh,kw] -> [kh,kw,I,O]
    return np.transpose(np.asarray(t), (2, 3, 1, 0))


def _bn(sd, prefix):
    return {
        "scale": np.asarray(sd[f"{prefix}.weight"]),
        "bias": np.asarray(sd[f"{prefix}.bias"]),
        "mean": np.asarray(sd[f"{prefix}.running_mean"]),
        "var": np.asarray(sd[f"{prefix}.running_var"]),
    }


def convert_torch_weights(model: ArcFaceModel, path: str):
    """model_ir_se50.pth state_dict -> flax params. The output Linear's
    input dim is re-ordered from torch's (C,H,W) flatten to NHWC (H,W,C)."""
    import torch

    sd = torch.load(path, map_location="cpu")
    p: dict = {
        "input_conv": {"weight": _conv_w(sd["input_layer.0.weight"])},
        "input_bn": _bn(sd, "input_layer.1"),
        "input_prelu": {"alpha": np.asarray(sd["input_layer.2.weight"])},
        "out_bn": _bn(sd, "output_layer.0"),
        "out_bn1d": _bn(sd, "output_layer.4"),
    }
    # output fc: torch [512, 512*7*7] with input index c*49+h*7+w
    w = np.asarray(sd["output_layer.3.weight"])  # [512, 25088]
    w = w.reshape(512, 512, 7, 7).transpose(2, 3, 1, 0).reshape(7 * 7 * 512, 512)
    p["out_fc"] = {"weight": w, "bias": np.asarray(sd["output_layer.3.bias"])}

    b = 0
    for depth, units in STAGES_50:
        for u in range(units):
            pre = f"body.{b}"
            blk = {
                "bn0": _bn(sd, f"{pre}.res_layer.0"),
                "conv1": {"weight": _conv_w(sd[f"{pre}.res_layer.1.weight"])},
                "prelu": {"alpha": np.asarray(sd[f"{pre}.res_layer.2.weight"])},
                "conv2": {"weight": _conv_w(sd[f"{pre}.res_layer.3.weight"])},
                "bn2": _bn(sd, f"{pre}.res_layer.4"),
                "se": {
                    "fc1": {"weight": _conv_w(sd[f"{pre}.res_layer.5.fc1.weight"])},
                    "fc2": {"weight": _conv_w(sd[f"{pre}.res_layer.5.fc2.weight"])},
                },
            }
            if f"{pre}.shortcut_layer.0.weight" in sd:
                blk["short_conv"] = {"weight": _conv_w(sd[f"{pre}.shortcut_layer.0.weight"])}
                blk["short_bn"] = _bn(sd, f"{pre}.shortcut_layer.1")
            p[f"block{b}"] = blk
            b += 1
    return {"params": jax.tree_util.tree_map(jnp.asarray, p)}
