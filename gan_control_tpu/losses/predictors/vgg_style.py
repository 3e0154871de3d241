"""VGG-16 gram-matrix style predictor (style_loss, MetFaces).

Behavior contract (reference losses/stayle/):
  - skeleton (style_skeleton.py:39-73): bilinear resize to ``resize_to``
    (align_corners=True) FIRST, then optional center_crop, ImageNet renorm
    from [-1,1]; torchvision vgg16.features sliced at relu1_2 / relu2_2 /
    relu3_3 / relu4_3; each feature map -> gram matrix
    ``G = F Fᵀ / (C·H·W)``.
  - criterion (style_criterion.py): pairwise MSE of grams x 1e5; applied to
    EVERY layer (``intermediate_criterion_as_last_layer`` in the MetFaces
    config).

Weights: torchvision vgg16 pretrained (conv features only)."""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from gan_control_tpu.losses.contrastive import pairwise_mse_gram
from gan_control_tpu.losses.predictors.common import (
    Conv,
    center_crop,
    max_pool,
    resize_bilinear,
)

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)

# torchvision vgg16.features conv indices per slice (style_skeleton.py:28-35)
SLICES = (
    ((0, 64), (2, 64)),                     # -> relu1_2
    ((5, 128), (7, 128)),                   # -> relu2_2 (pool first)
    ((10, 256), (12, 256), (14, 256)),      # -> relu3_3
    ((17, 512), (19, 512), (21, 512)),      # -> relu4_3
)


def gram_matrix(y: jax.Array) -> jax.Array:
    """NHWC -> [B, C, C] gram, normalized by C*H*W (style_skeleton.py:68-73)."""
    b, h, w, c = y.shape
    f = y.reshape(b, h * w, c)
    return jnp.einsum("bnc,bnd->bcd", f, f) / (c * h * w)


class VGG16Features(nn.Module):
    @nn.compact
    def __call__(self, x):
        grams = []
        for s, convs in enumerate(SLICES):
            if s > 0:
                x = max_pool(x, 2, 2)
            for idx, ch in convs:
                x = jax.nn.relu(Conv(ch, 3, padding=1, name=f"conv{idx}")(x))
            grams.append(gram_matrix(x))
        return grams


@dataclasses.dataclass(frozen=True)
class StyleModel:
    module: VGG16Features
    resize_to: int
    center_crop: int | None


def make_model(config: dict) -> StyleModel:
    return StyleModel(
        module=VGG16Features(),
        resize_to=config.get("resize_to", 256),
        center_crop=config.get("center_crop"),
    )


def init_params(model: StyleModel, rng: jax.Array):
    return model.module.init(rng, jnp.zeros((1, model.resize_to, model.resize_to, 3)))


def preprocess(model: StyleModel, images: jax.Array) -> jax.Array:
    if images.shape[1] != model.resize_to:
        images = resize_bilinear(
            images, (model.resize_to, model.resize_to), align_corners=True
        )
    if model.center_crop is not None and images.shape[1] > model.center_crop:
        images = center_crop(images, model.center_crop)
    x = images * 0.5 + 0.5
    return (x - IMAGENET_MEAN) / IMAGENET_STD


def features(model: StyleModel, params, images: jax.Array):
    # backbone at the caller's dtype; preprocess upcasts via f32 constants
    return model.module.apply(
        params, preprocess(model, images).astype(images.dtype)
    )


def last_layer_dist(gram: jax.Array) -> jax.Array:
    return pairwise_mse_gram(gram)


def predict(model: StyleModel, params, images: jax.Array) -> jax.Array:
    return features(model, params, images)[-1]


def controller_criterion(pred: jax.Array, target: jax.Array) -> jax.Array:
    return jnp.mean(jnp.square(pred - target)) * 1e5


def convert_torch_weights(model: StyleModel, path: str):
    """Accepts a torchvision vgg16 state_dict (full model or .features)."""
    import torch

    from gan_control_tpu.losses.predictors.resnet import conv_w

    sd = torch.load(path, map_location="cpu")
    prefix = "features." if any(k.startswith("features.") for k in sd) else ""
    p = {}
    for convs in SLICES:
        for idx, _ in convs:
            p[f"conv{idx}"] = {
                "weight": conv_w(sd[f"{prefix}{idx}.weight"]),
                "bias": np.asarray(sd[f"{prefix}{idx}.bias"]),
            }
    return {"params": jax.tree_util.tree_map(jnp.asarray, p)}
