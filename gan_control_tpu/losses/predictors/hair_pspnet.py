"""PSPNet hair segmentation — hair-color predictor (hair_loss).

Behavior contract (reference losses/hair_loss/):
  - skeleton (hair_skeleton.py:22-38): bilinear resize to 256
    (align_corners=True); the segmentation mask is computed WITHOUT gradient
    (ImageNet renorm -> PSPNet -> sigmoid >= 0.5), then the feature is
    [image * mask ++ mask] — gradients flow to the image only through the
    multiplication.
  - architecture (hair_model.py): ResNet-101 trunk truncated after layer3
    (1024 ch, stride 16), pyramid pooling at sizes (1,2,3,6) (adaptive avg
    pool + 1x1 conv + bilinear upsample, concat -> 2048), three 2x-upsample
    conv-BN-relu stages (256, 64, 64), final 1x1 conv -> 1 logit, resized
    to input resolution.
  - criterion (hair_criterion.py): mean hair RGB (remapped to [0,1]) per
    image, pairwise L1 with >=1% hair-pixel validity mask; predict = mean
    hair RGB; controller_criterion = MSE.

Weights: pspnet_resnet101_...pth ({'weight': state_dict})."""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from gan_control_tpu.losses.contrastive import pairwise_hair_color
from gan_control_tpu.losses.predictors.common import (
    Conv,
    FrozenBatchNorm,
    adaptive_avg_pool,
    resize_bilinear,
)
from gan_control_tpu.losses.predictors.resnet import ResNetTrunk, convert_trunk

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)
PSP_SIZES = (1, 2, 3, 6)
INPUT_SIZE = 256


class PSPNet(nn.Module):
    """Input: renormalized image; output: [B,H,W,1] mask logit."""

    @nn.compact
    def __call__(self, x):
        h, w = x.shape[1], x.shape[2]
        feats = ResNetTrunk(layers=(3, 4, 23), name="trunk")(x)[-1]  # 1024ch
        fh, fw = feats.shape[1], feats.shape[2]
        pyramid = [feats]
        for i, size in enumerate(PSP_SIZES):
            p = adaptive_avg_pool(feats, size)
            p = Conv(1024 // len(PSP_SIZES), 1, name=f"psp{i}")(p)
            pyramid.append(resize_bilinear(p, (fh, fw), align_corners=False))
        x = jnp.concatenate(pyramid, axis=-1)  # 2048
        for j, ch in enumerate((256, 64, 64)):
            x = resize_bilinear(x, (x.shape[1] * 2, x.shape[2] * 2), align_corners=False)
            x = Conv(ch, 3, padding=1, use_bias=False, name=f"up{j}_conv")(x)
            x = FrozenBatchNorm(ch, name=f"up{j}_bn")(x)
            x = jax.nn.relu(x)
        logit = Conv(1, 1, name="final")(x)
        if logit.shape[1] != h:
            logit = resize_bilinear(logit, (h, w), align_corners=False)
        return logit


@dataclasses.dataclass(frozen=True)
class HairModel:
    module: PSPNet


def make_model(config: dict) -> HairModel:
    return HairModel(module=PSPNet())


def init_params(model: HairModel, rng: jax.Array):
    return model.module.init(rng, jnp.zeros((1, INPUT_SIZE, INPUT_SIZE, 3)))


def features(model: HairModel, params, images: jax.Array):
    """[masked_image ++ mask] NHWC [B,256,256,4]; mask has no gradient."""
    if images.shape[1] != INPUT_SIZE:
        images = resize_bilinear(images, (INPUT_SIZE, INPUT_SIZE), align_corners=True)
    net_in = ((jax.lax.stop_gradient(images) * 0.5 + 0.5) - IMAGENET_MEAN) / IMAGENET_STD
    # mask net at the caller's dtype; the normalization upcast via f32 consts
    logit = model.module.apply(params, net_in.astype(images.dtype))
    mask = (jax.nn.sigmoid(logit) >= 0.5).astype(images.dtype)
    mask = jax.lax.stop_gradient(mask)
    return [jnp.concatenate([images * mask, mask], axis=-1)]


def last_layer_dist(feat: jax.Array) -> jax.Array:
    return pairwise_hair_color(feat)


def predict(model: HairModel, params, images: jax.Array) -> jax.Array:
    """Mean hair RGB in [0,1], zero when <0.5 hair pixels
    (hair_criterion.predict)."""
    f = features(model, params, images)[0]
    masked_img, mask = f[..., :3], f[..., 3:]
    mask_sum = jnp.sum(mask, axis=(1, 2))
    valid = mask_sum > 0.5
    color = jnp.sum(masked_img, axis=(1, 2)) / (mask_sum + (mask_sum < 0.5))
    return (color * 0.5 + 0.5) * valid


def controller_criterion(pred: jax.Array, target: jax.Array) -> jax.Array:
    return jnp.mean(jnp.square(pred - target))


def convert_torch_weights(model: HairModel, path: str):
    import torch

    from gan_control_tpu.losses.predictors.resnet import bn_params, conv_w

    sd = torch.load(path, map_location="cpu")["weight"]
    # base_network.features.{0,1}=stem, .{4,5,6}=layer1..3 (torchvision children)
    trunk_sd = {}
    for k, v in sd.items():
        if not k.startswith("base_network.features."):
            continue
        rest = k[len("base_network.features."):]
        idx, _, tail = rest.partition(".")
        idx = int(idx)
        if idx == 0:
            trunk_sd[f"conv1.{tail}"] = v
        elif idx == 1:
            trunk_sd[f"bn1.{tail}"] = v
        elif idx >= 4:
            trunk_sd[f"layer{idx - 3}.{tail}"] = v
    p: dict = {"trunk": convert_trunk(trunk_sd, (3, 4, 23), bottleneck=True)}
    for i in range(len(PSP_SIZES)):
        p[f"psp{i}"] = {
            "weight": conv_w(sd[f"psp.pooling_layers.{i}.1.weight"]),
            "bias": np.asarray(sd[f"psp.pooling_layers.{i}.1.bias"]),
        }
    for j in range(3):
        p[f"up{j}_conv"] = {"weight": conv_w(sd[f"up_{j + 1}.conv.0.weight"])}
        p[f"up{j}_bn"] = bn_params(sd, f"up_{j + 1}.conv.1")
    p["final"] = {
        "weight": conv_w(sd["final.0.weight"]),
        "bias": np.asarray(sd["final.0.bias"]),
    }
    return {"params": jax.tree_util.tree_map(jnp.asarray, p)}
