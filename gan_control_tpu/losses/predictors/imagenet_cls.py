"""ImageNet ResNet-18 — generic class-feature predictor (classification_loss;
disabled in all shipped configs but part of the loss factory surface).

Behavior contract (reference losses/imagenet/): torchvision resnet18;
skeleton returns [logits, pre-fc 512-d embedding] (imagenet_skeleton.py
:23-43 — NOTE the order: the LAST list entry, the criterion input, is the
pre-fc embedding); bilinear resize to 224 align_corners=True; criterion:
pairwise mean-|diff| (imagenet_criterion.py)."""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from gan_control_tpu.losses.contrastive import pairwise_l1
from gan_control_tpu.losses.predictors.common import Dense, center_crop, resize_bilinear
from gan_control_tpu.losses.predictors.resnet import ResNetTrunk, convert_trunk


class ResNet18Net(nn.Module):
    @nn.compact
    def __call__(self, x):
        l4 = ResNetTrunk(layers=(2, 2, 2, 2), bottleneck=False, name="trunk")(x)[-1]
        emb = jnp.mean(l4, axis=(1, 2))
        logits = Dense(1000, name="fc")(emb)
        return [logits, emb]


@dataclasses.dataclass(frozen=True)
class ImageNetModel:
    module: ResNet18Net
    center_crop: int | None


def make_model(config: dict) -> ImageNetModel:
    return ImageNetModel(module=ResNet18Net(), center_crop=config.get("center_crop"))


def init_params(model: ImageNetModel, rng: jax.Array):
    return model.module.init(rng, jnp.zeros((1, 224, 224, 3)))


def features(model: ImageNetModel, params, images: jax.Array):
    dtype = images.dtype
    if images.shape[1] != 224:
        if model.center_crop is not None and images.shape[1] > model.center_crop:
            images = center_crop(images, model.center_crop)
        images = resize_bilinear(images, (224, 224), align_corners=True)
    # backbone at the caller's dtype (resize may upcast to f32)
    return model.module.apply(params, images.astype(dtype))


def last_layer_dist(emb: jax.Array) -> jax.Array:
    return pairwise_l1(emb)


def predict(model: ImageNetModel, params, images: jax.Array) -> jax.Array:
    return jnp.argmax(features(model, params, images)[0], axis=-1)


def controller_criterion(pred: jax.Array, target: jax.Array) -> jax.Array:
    return jnp.mean(jnp.abs(pred - target))


def convert_torch_weights(model: ImageNetModel, path: str):
    import torch

    sd = torch.load(path, map_location="cpu")
    p = {
        "trunk": convert_trunk(sd, (2, 2, 2, 2), bottleneck=False),
        "fc": {"weight": np.asarray(sd["fc.weight"]).T, "bias": np.asarray(sd["fc.bias"])},
    }
    return {"params": jax.tree_util.tree_map(jnp.asarray, p)}
