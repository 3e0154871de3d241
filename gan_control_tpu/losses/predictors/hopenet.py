"""Hopenet — head-pose predictor (orientation_loss).

Behavior contract (reference losses/deep_head_pose/):
  - architecture: ResNet-50 trunk + AvgPool(7) + three 66-bin heads
    (yaw/pitch/roll) (hopenet_model.py:7-25).
  - skeleton forward (hopenet_skeleton.py:24-56): bilinear resize to 224
    (align_corners=True), ImageNet mean/std renorm from [-1,1], returns
    [layer1..4, logits [B,3,66]].
  - criterion: pairwise mean-|diff| over (head, bin) (hopenet_criterion.py
    :35-40); predict = softmax expectation * 3 - 99 degrees (:7-23,42-45);
    controller_criterion = L1 (:46-47).

Weights: hopenet_robust_alpha1.pkl (torch save of the full model or
state_dict)."""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from gan_control_tpu.losses.contrastive import pairwise_l1
from gan_control_tpu.losses.predictors.common import Dense, resize_bilinear
from gan_control_tpu.losses.predictors.resnet import ResNetTrunk, convert_trunk

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)
NUM_BINS = 66


class HopenetNet(nn.Module):
    @nn.compact
    def __call__(self, x):
        l1, l2, l3, l4 = ResNetTrunk(layers=(3, 4, 6, 3), name="trunk")(x)
        pooled = jnp.mean(l4, axis=(1, 2))  # AvgPool(7) on 7x7 == global mean
        yaw = Dense(NUM_BINS, name="fc_yaw")(pooled)
        pitch = Dense(NUM_BINS, name="fc_pitch")(pooled)
        roll = Dense(NUM_BINS, name="fc_roll")(pooled)
        logits = jnp.stack([yaw, pitch, roll], axis=1)  # [B, 3, 66]
        return [l1, l2, l3, l4, logits]


@dataclasses.dataclass(frozen=True)
class HopenetModel:
    module: HopenetNet


def make_model(config: dict) -> HopenetModel:
    return HopenetModel(module=HopenetNet())


def init_params(model: HopenetModel, rng: jax.Array):
    return model.module.init(rng, jnp.zeros((1, 224, 224, 3)))


def preprocess(images: jax.Array) -> jax.Array:
    if images.shape[1] != 224:
        images = resize_bilinear(images, (224, 224), align_corners=True)
    x = images * 0.5 + 0.5
    return (x - IMAGENET_MEAN) / IMAGENET_STD


def features(model: HopenetModel, params, images: jax.Array):
    # backbone at the caller's dtype; preprocess upcasts via f32 constants
    return model.module.apply(params, preprocess(images).astype(images.dtype))


def last_layer_dist(logits: jax.Array) -> jax.Array:
    return pairwise_l1(logits)


def orientation_from_logits(logits: jax.Array) -> jax.Array:
    """[B,3,66] -> [B,3] degrees: softmax expectation * 3 - 99 (reference
    hopenet_criterion.calc_orientation_from_features)."""
    probs = jax.nn.softmax(logits, axis=-1)
    idx = jnp.arange(NUM_BINS, dtype=logits.dtype)
    return jnp.sum(probs * idx, axis=-1) * 3.0 - 99.0


def predict(model: HopenetModel, params, images: jax.Array) -> jax.Array:
    return orientation_from_logits(features(model, params, images)[-1])


def controller_criterion(pred: jax.Array, target: jax.Array) -> jax.Array:
    return jnp.mean(jnp.abs(pred - target))


def convert_torch_weights(model: HopenetModel, path: str):
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    sd = obj if isinstance(obj, dict) else obj.state_dict()
    p = {
        "trunk": convert_trunk(sd, (3, 4, 6, 3), bottleneck=True),
        "fc_yaw": {
            "weight": np.asarray(sd["fc_yaw.weight"]).T,
            "bias": np.asarray(sd["fc_yaw.bias"]),
        },
        "fc_pitch": {
            "weight": np.asarray(sd["fc_pitch.weight"]).T,
            "bias": np.asarray(sd["fc_pitch.bias"]),
        },
        "fc_roll": {
            "weight": np.asarray(sd["fc_roll.weight"]).T,
            "bias": np.asarray(sd["fc_roll.bias"]),
        },
    }
    return {"params": jax.tree_util.tree_map(jnp.asarray, p)}
