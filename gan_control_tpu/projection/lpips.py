"""LPIPS perceptual distance — VGG16 variant, flax.

Behavior contract (reference projection/lpips/, the vendored richzhang
LPIPS): scale input by ImageNet-ish shift/scale, VGG16 features at
relu1_2/2_2/3_3/4_3/5_3, unit-normalize each feature map along channels,
squared difference, 1x1 non-negative linear weighting per layer, spatial
mean, sum over layers.

The linear-head weights ship with the reference
(projection/lpips/weights/v0.1/vgg.pth) and convert directly; the VGG
backbone weights are torchvision-pretrained (converted via
vgg_style.convert-style conv mapping when available, random otherwise)."""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from gan_control_tpu.losses.predictors.common import Conv, max_pool

# LPIPS input scaling (richzhang scaling_layer)
SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
SCALE = np.array([0.458, 0.448, 0.450], np.float32)

# torchvision vgg16.features conv indices per LPIPS slice (5 slices)
SLICES = (
    ((0, 64), (2, 64)),
    ((5, 128), (7, 128)),
    ((10, 256), (12, 256), (14, 256)),
    ((17, 512), (19, 512), (21, 512)),
    ((24, 512), (26, 512), (28, 512)),
)
CHANNELS = (64, 128, 256, 512, 512)


class _VGGBackbone(nn.Module):
    """Shared VGG16 feature slices; invoked once per image of the pair so
    the conv params are shared (a twice-called inline compact backbone would
    collide on submodule names)."""

    @nn.compact
    def __call__(self, x):
        x = (x - SHIFT) / SCALE
        feats = []
        for s, convs in enumerate(SLICES):
            if s > 0:
                x = max_pool(x, 2, 2)
            for idx, ch in convs:
                x = jax.nn.relu(Conv(ch, 3, padding=1, name=f"conv{idx}")(x))
            feats.append(x)
        return feats


class LPIPS(nn.Module):
    """images in [-1,1] NHWC pairs -> per-pair distance [B]."""

    @nn.compact
    def __call__(self, x0: jax.Array, x1: jax.Array) -> jax.Array:
        backbone = _VGGBackbone(name="vgg")
        f0 = backbone(x0)
        f1 = backbone(x1)

        total = jnp.zeros((x0.shape[0],), jnp.float32)
        for li, (a, b) in enumerate(zip(f0, f1)):
            a = a / jnp.sqrt(jnp.sum(jnp.square(a), axis=-1, keepdims=True) + 1e-10)
            b = b / jnp.sqrt(jnp.sum(jnp.square(b), axis=-1, keepdims=True) + 1e-10)
            diff = jnp.square(a - b)
            w = self.param(
                f"lin{li}",
                nn.initializers.constant(1.0 / CHANNELS[li]),
                (CHANNELS[li],),
            )
            total = total + jnp.mean(diff @ jnp.abs(w), axis=(1, 2))
        return total


def init_params(rng: jax.Array, size: int = 64):
    return LPIPS().init(rng, jnp.zeros((1, size, size, 3)), jnp.zeros((1, size, size, 3)))


def lpips_distance(params, x0, x1) -> jax.Array:
    return LPIPS().apply(params, x0, x1)


def convert_torch_weights(vgg_path: str | None, lin_path: str | None, rng=None):
    """Build params from torchvision vgg16 (conv backbone) + richzhang lin
    weights ('lin{i}.model.1.weight' entries, shape [1, C, 1, 1])."""
    import torch

    from gan_control_tpu.losses.predictors.resnet import conv_w

    params = init_params(rng or jax.random.PRNGKey(0))["params"]
    p = dict(jax.tree_util.tree_map(np.asarray, params))
    if vgg_path:
        sd = torch.load(vgg_path, map_location="cpu")
        prefix = "features." if any(k.startswith("features.") for k in sd) else ""
        vgg = dict(p.get("vgg", {}))
        for convs in SLICES:
            for idx, _ in convs:
                vgg[f"conv{idx}"] = {
                    "weight": conv_w(sd[f"{prefix}{idx}.weight"]),
                    "bias": np.asarray(sd[f"{prefix}{idx}.bias"]),
                }
        p["vgg"] = vgg
    if lin_path:
        lin = torch.load(lin_path, map_location="cpu")
        for li in range(5):
            key = f"lin{li}.model.1.weight"
            if key in lin:
                p[f"lin{li}"] = np.asarray(lin[key]).reshape(-1)
    return {"params": jax.tree_util.tree_map(jnp.asarray, p)}
