"""DEX age predictor (age_loss) — caffe-style VGG-16, 101 age bins.

Behavior contract (reference losses/deep_expectation_age/):
  - vgg_transform (deep_age_skeleton.py:25-35): [-1,1] -> [0,1], subtract
    caffe ImageNet mean per RGB channel, swap to BGR, bilinear resize to 224
    (align_corners=False), scale x255.
  - forward (:46-73): VGG-16 conv stack (3x3 convs + 2x2 maxpools) ->
    fc6/fc7 (relu) -> fc8_101 logits; returns [logits] (single layer).
  - predict = softmax expectation over bins 0..100
    (deep_age_criterion.py:25-35); distances: pairwise mean-|diff| of
    logits; controller_criterion: MSE (:37-38).

Weights: dex_imdb_wiki.pt ('-' keys renamed to '_', skeleton :77-83)."""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from gan_control_tpu.losses.contrastive import pairwise_l1
from gan_control_tpu.losses.predictors.common import (
    Conv,
    Dense,
    center_crop,
    max_pool,
    resize_bilinear,
)

CAFFE_MEAN_RGB = np.array([0.48501961, 0.45795686, 0.40760392], np.float32)

VGG_CFG = ((64, 2), (128, 2), (256, 3), (512, 3), (512, 3))


class VGG16Caffe(nn.Module):
    """conv blocks -> flatten -> fc6 -> fc7 -> fc8_101; returns [logits]."""

    @nn.compact
    def __call__(self, x):
        for b, (ch, n) in enumerate(VGG_CFG):
            for c in range(n):
                x = Conv(ch, 3, padding=1, name=f"conv{b + 1}_{c + 1}")(x)
                x = jax.nn.relu(x)
            x = max_pool(x, 2, 2)
        # torch flattens NCHW (c,h,w); weight conversion re-orders instead
        x = x.reshape(x.shape[0], -1)
        x = jax.nn.relu(Dense(4096, name="fc6")(x))
        x = jax.nn.relu(Dense(4096, name="fc7")(x))
        logits = Dense(101, name="fc8_101")(x)
        return [logits]


@dataclasses.dataclass(frozen=True)
class DexAgeModel:
    module: VGG16Caffe
    center_crop: int | None


def make_model(config: dict) -> DexAgeModel:
    return DexAgeModel(module=VGG16Caffe(), center_crop=config.get("center_crop"))


def init_params(model: DexAgeModel, rng: jax.Array):
    return model.module.init(rng, jnp.zeros((1, 224, 224, 3)))


def preprocess(model: DexAgeModel, images: jax.Array) -> jax.Array:
    if model.center_crop is not None and images.shape[1] > model.center_crop:
        images = center_crop(images, model.center_crop)
    x = images * 0.5 + 0.5
    x = x - CAFFE_MEAN_RGB
    x = x[..., ::-1]  # RGB -> BGR
    x = resize_bilinear(x, (224, 224), align_corners=False)
    return x * 255.0


def features(model: DexAgeModel, params, images: jax.Array):
    # backbone at the caller's dtype; preprocess upcasts via f32 constants
    return model.module.apply(
        params, preprocess(model, images).astype(images.dtype)
    )


def last_layer_dist(logits: jax.Array) -> jax.Array:
    return pairwise_l1(logits)


def age_from_logits(logits: jax.Array) -> jax.Array:
    probs = jax.nn.softmax(logits, axis=-1)
    bins = jnp.arange(101, dtype=logits.dtype)
    return jnp.sum(probs * bins, axis=-1)


def predict(model: DexAgeModel, params, images: jax.Array) -> jax.Array:
    return age_from_logits(features(model, params, images)[-1])


def controller_criterion(pred: jax.Array, target: jax.Array) -> jax.Array:
    return jnp.mean(jnp.square(pred - target))


def convert_torch_weights(model: DexAgeModel, path: str):
    import torch

    from gan_control_tpu.losses.predictors.resnet import conv_w

    sd = torch.load(path, map_location="cpu")
    sd = {k.replace("-", "_"): v for k, v in sd.items()}
    p: dict = {}
    for b, (ch, n) in enumerate(VGG_CFG):
        for c in range(n):
            name = f"conv{b + 1}_{c + 1}"
            p[name] = {
                "weight": conv_w(sd[f"{name}.weight"]),
                "bias": np.asarray(sd[f"{name}.bias"]),
            }
    # fc6 input: torch flatten order (C=512, H=7, W=7) -> NHWC (7,7,512)
    w6 = np.asarray(sd["fc6.weight"])  # [4096, 25088]
    w6 = w6.reshape(4096, 512, 7, 7).transpose(2, 3, 1, 0).reshape(7 * 7 * 512, 4096)
    p["fc6"] = {"weight": w6, "bias": np.asarray(sd["fc6.bias"])}
    p["fc7"] = {"weight": np.asarray(sd["fc7.weight"]).T, "bias": np.asarray(sd["fc7.bias"])}
    p["fc8_101"] = {
        "weight": np.asarray(sd["fc8_101.weight"]).T,
        "bias": np.asarray(sd["fc8_101.bias"]),
    }
    return {"params": jax.tree_util.tree_map(jnp.asarray, p)}
