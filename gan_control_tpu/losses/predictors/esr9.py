"""ESR-9 expression predictor (expression_loss).

Behavior contract (reference losses/facial_features_esr/):
  - architecture (esr9_model.py): shared Base (4 convs, valid padding except
    none, 2 maxpools) + 9 ConvolutionalBranches (4 convs + global avg pool
    + fc(512->8) emotions + fc(8->2) affect).
  - skeleton forward (esr9_skeleton.py:24-43): optional center_crop,
    bilinear resize to 96x96 (align_corners=True), [-1,1] -> [0,1], returns
    [shared_representation, emotions [B,9,8]].
  - criterion: pairwise mean-|diff| over (branch, class)
    (esr9_criterion.py:17-21).
  - expression classes (evaluation/expression.py:18-29): Neutral, Happy,
    Sad, Surprise, Fear, Disgust, Anger, Contempt; image-level label =
    ensemble vote (expression.py:32-40).

Weights: esr_9 directory with Net-Base-Shared_Representations.pt +
Net-Branch_{1..9}.pt."""

from __future__ import annotations

import dataclasses
import os

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from gan_control_tpu.losses.contrastive import pairwise_l1
from gan_control_tpu.losses.predictors.common import (
    Conv,
    FrozenBatchNorm,
    center_crop,
    max_pool,
    resize_bilinear,
)
from gan_control_tpu.losses.predictors.resnet import bn_params, conv_w

EXPRESSION_CLASSES = (
    "Neutral", "Happy", "Sad", "Surprise", "Fear", "Disgust", "Anger", "Contempt",
)
NUM_BRANCHES = 9
INPUT_SIZE = 96


class ESRBase(nn.Module):
    @nn.compact
    def __call__(self, x):
        x = jax.nn.relu(FrozenBatchNorm(64, name="bn1")(Conv(64, 5, name="conv1")(x)))
        x = max_pool(
            jax.nn.relu(FrozenBatchNorm(128, name="bn2")(Conv(128, 3, name="conv2")(x))),
            2, 2,
        )
        x = jax.nn.relu(FrozenBatchNorm(128, name="bn3")(Conv(128, 3, name="conv3")(x)))
        x = max_pool(
            jax.nn.relu(FrozenBatchNorm(128, name="bn4")(Conv(128, 3, name="conv4")(x))),
            2, 2,
        )
        return x


class ESRBranch(nn.Module):
    @nn.compact
    def __call__(self, x):
        x = jax.nn.relu(FrozenBatchNorm(128, name="bn1")(Conv(128, 3, name="conv1")(x)))
        x = max_pool(
            jax.nn.relu(FrozenBatchNorm(256, name="bn2")(Conv(256, 3, name="conv2")(x))),
            2, 2,
        )
        x = jax.nn.relu(FrozenBatchNorm(256, name="bn3")(Conv(256, 3, name="conv3")(x)))
        x = jax.nn.relu(
            FrozenBatchNorm(512, name="bn4")(Conv(512, 3, padding=1, name="conv4")(x))
        )
        x = jnp.mean(x, axis=(1, 2))  # global avg pool
        w = self.param("fc_weight", nn.initializers.normal(0.02), (512, 8))
        b = self.param("fc_bias", nn.initializers.zeros, (8,))
        return x @ w.astype(x.dtype) + b.astype(x.dtype)


class ESR9Net(nn.Module):
    @nn.compact
    def __call__(self, x):
        shared = ESRBase(name="base")(x)
        emotions = [
            ESRBranch(name=f"branch{i}")(shared)[:, None, :]
            for i in range(NUM_BRANCHES)
        ]
        return [shared, jnp.concatenate(emotions, axis=1)]  # [B,9,8]


@dataclasses.dataclass(frozen=True)
class ESR9Model:
    module: ESR9Net
    center_crop: int | None


def make_model(config: dict) -> ESR9Model:
    return ESR9Model(module=ESR9Net(), center_crop=config.get("center_crop"))


def init_params(model: ESR9Model, rng: jax.Array):
    return model.module.init(rng, jnp.zeros((1, INPUT_SIZE, INPUT_SIZE, 3)))


def preprocess(model: ESR9Model, images: jax.Array) -> jax.Array:
    if model.center_crop is not None and images.shape[1] > model.center_crop:
        images = center_crop(images, model.center_crop)
    if images.shape[1] != INPUT_SIZE:
        images = resize_bilinear(images, (INPUT_SIZE, INPUT_SIZE), align_corners=True)
    return images * 0.5 + 0.5


def features(model: ESR9Model, params, images: jax.Array):
    # backbone at the caller's dtype; preprocess upcasts via f32 constants
    return model.module.apply(
        params, preprocess(model, images).astype(images.dtype)
    )


def last_layer_dist(emotions: jax.Array) -> jax.Array:
    return pairwise_l1(emotions)


def predict(model: ESR9Model, params, images: jax.Array) -> jax.Array:
    """Ensemble-vote class index per image (evaluation/expression.py:32-40)."""
    emotions = features(model, params, images)[-1]  # [B,9,8]
    votes = jnp.argmax(emotions, axis=-1)  # [B,9]
    onehot = jax.nn.one_hot(votes, len(EXPRESSION_CLASSES))
    return jnp.argmax(jnp.sum(onehot, axis=1), axis=-1)


def controller_criterion(pred: jax.Array, target: jax.Array) -> jax.Array:
    return jnp.mean(jnp.abs(pred - target))


def convert_torch_weights(model: ESR9Model, path: str):
    """path = the esr_9 directory (reference ESR.__init__)."""
    import torch

    def load_block(sd, has_fc):
        blk = {}
        for c in range(1, 5):
            blk[f"conv{c}"] = {
                "weight": conv_w(sd[f"conv{c}.weight"]),
                "bias": np.asarray(sd[f"conv{c}.bias"]),
            }
            blk[f"bn{c}"] = bn_params(sd, f"bn{c}")
        if has_fc:
            blk["fc_weight"] = np.asarray(sd["fc.weight"]).T
            blk["fc_bias"] = np.asarray(sd["fc.bias"])
        return blk

    base_sd = torch.load(
        os.path.join(path, "Net-Base-Shared_Representations.pt"), map_location="cpu"
    )
    p = {"base": load_block(base_sd, has_fc=False)}
    for i in range(1, NUM_BRANCHES + 1):
        sd = torch.load(os.path.join(path, f"Net-Branch_{i}.pt"), map_location="cpu")
        p[f"branch{i - 1}"] = load_block(sd, has_fc=True)
    return {"params": jax.tree_util.tree_map(jnp.asarray, p)}
