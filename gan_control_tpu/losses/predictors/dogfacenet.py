"""DogFaceNet — dog-identity predictor (dog_id_loss, AFHQ).

Behavior contract (reference losses/dogfacenet/):
  - architecture (models/pytorch_dogfacenet_model.py:27-123, a TF-Keras
    conversion): stem zero-pad (l2,r4,t2,b4) + 7x7/2 conv + relu + BN (TF
    order: activation BEFORE batchnorm) + maxpool(3, stride 3); five
    ResBlocks (16,32,64,128,512) each: asymmetric-pad 3x3/2 conv + relu +
    BN -> r, then two (conv3x3 + relu + BN) residual adds; global avg pool
    -> Linear(512->32, no bias) -> l2-norm.
  - skeleton (dogfacenet_skeleton.py:24-31): [-1,1] -> [0,1] FIRST, then
    center_crop + bicubic resize to 224 (align_corners=True); returns
    [embedding].
  - criterion: pairwise squared-L2 (dogfacenet_criterion.py)."""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from gan_control_tpu.losses.contrastive import pairwise_sq_l2
from gan_control_tpu.losses.predictors.common import (
    Conv,
    FrozenBatchNorm,
    center_crop,
    l2_normalize,
    max_pool,
    resize_bicubic,
)

BLOCKS = ((16, "reg"), (32, "reg"), (64, "b3"), (128, "reg"), (512, "reg"))


class DogResBlock(nn.Module):
    out_ch: int
    pad: str  # 'reg' -> (1,1,1,1), 'b3' -> (0,1,0,1) (left,right,top,bottom)

    @nn.compact
    def __call__(self, x):
        if self.pad == "reg":
            x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        else:
            x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        x = Conv(self.out_ch, 3, stride=2, use_bias=False, name="conv0")(x)
        r = FrozenBatchNorm(self.out_ch, name="bn0")(jax.nn.relu(x))
        x = Conv(self.out_ch, 3, padding=1, use_bias=False, name="conv1")(r)
        x = FrozenBatchNorm(self.out_ch, name="bn1")(jax.nn.relu(x))
        r = r + x
        x = Conv(self.out_ch, 3, padding=1, use_bias=False, name="conv2")(r)
        x = FrozenBatchNorm(self.out_ch, name="bn2")(jax.nn.relu(x))
        return r + x


class DogFaceNetModule(nn.Module):
    @nn.compact
    def __call__(self, x):
        x = jnp.pad(x, ((0, 0), (2, 4), (2, 4), (0, 0)))  # (t,b)=(2,4),(l,r)=(2,4)
        x = Conv(16, 7, stride=2, use_bias=False, name="conv0")(x)
        x = FrozenBatchNorm(16, name="bn0")(jax.nn.relu(x))
        x = max_pool(x, 3, 3)
        for i, (ch, pad) in enumerate(BLOCKS):
            x = DogResBlock(ch, pad, name=f"block{i + 1}")(x)
        x = jnp.mean(x, axis=(1, 2))
        w = self.param("fc_weight", nn.initializers.normal(0.02), (512, 32))
        return l2_normalize(x @ w.astype(x.dtype), axis=-1)


@dataclasses.dataclass(frozen=True)
class DogFaceModel:
    module: DogFaceNetModule
    center_crop: int | None


def make_model(config: dict) -> DogFaceModel:
    return DogFaceModel(module=DogFaceNetModule(), center_crop=config.get("center_crop"))


def init_params(model: DogFaceModel, rng: jax.Array):
    return model.module.init(rng, jnp.zeros((1, 224, 224, 3)))


def preprocess(model: DogFaceModel, images: jax.Array) -> jax.Array:
    x = images * 0.5 + 0.5
    if x.shape[1] != 224:
        if model.center_crop is not None and x.shape[1] > model.center_crop:
            x = center_crop(x, model.center_crop)
        x = resize_bicubic(x, (224, 224), align_corners=True)
    return x


def features(model: DogFaceModel, params, images: jax.Array):
    # backbone at the caller's dtype; preprocess upcasts via f32 constants
    return [
        model.module.apply(
            params, preprocess(model, images).astype(images.dtype)
        )
    ]


def last_layer_dist(emb: jax.Array) -> jax.Array:
    return pairwise_sq_l2(emb)


def predict(model: DogFaceModel, params, images: jax.Array) -> jax.Array:
    return features(model, params, images)[-1]


def controller_criterion(pred: jax.Array, target: jax.Array) -> jax.Array:
    return jnp.mean(jnp.square(pred - target))


def convert_torch_weights(model: DogFaceModel, path: str):
    import torch

    from gan_control_tpu.losses.predictors.resnet import bn_params, conv_w

    sd = torch.load(path, map_location="cpu")
    p: dict = {
        "conv0": {"weight": conv_w(sd["conv0.weight"])},
        "bn0": bn_params(sd, "bn0"),
        "fc_weight": np.asarray(sd["fc.weight"]).T,
    }
    for i in range(len(BLOCKS)):
        t = f"res_block{i + 1}"
        p[f"block{i + 1}"] = {
            "conv0": {"weight": conv_w(sd[f"{t}.conv0.weight"])},
            "bn0": bn_params(sd, f"{t}.bn0"),
            "conv1": {"weight": conv_w(sd[f"{t}.conv1.weight"])},
            "bn1": bn_params(sd, f"{t}.bn1"),
            "conv2": {"weight": conv_w(sd[f"{t}.conv2.weight"])},
            "bn2": bn_params(sd, f"{t}.bn2"),
        }
    return {"params": jax.tree_util.tree_map(jnp.asarray, p)}
