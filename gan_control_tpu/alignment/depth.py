"""ResNetDepth — the 3D-landmark z network of the vendored face-alignment
package (reference face-alignment/face_alignment/models.py:199-261).

Behavior contract:
  - Bottleneck ResNet with torchvision-v1 stage layout ``[3, 8, 36, 3]``
    (ResNet-152 shape) whose stem conv takes **3+68 channels**: the RGB
    crop concatenated with one gaussian heatmap per landmark
    (api.py:168-178).
  - Heatmaps are drawn at the 256 crop resolution from the 64-space
    heatmap peaks scaled x4, sigma=2, additive and clipped to 1
    (utils.draw_gaussian, utils.py:37-53; only landmarks with x > 0 get a
    gaussian, api.py:171).
  - Output: 68 scalars = per-landmark depth in crop space; the facade
    rescales by ``200*scale/256`` into original-image units (api.py:182).

TPU-first notes: the network is the shared frozen ``ResNetTrunk``
running in one jit — all 3x3/1x1 convs, which XLA tiles onto the MXU
directly. Heatmap rendering is host-side numpy: a per-(image, landmark)
loop that pastes one precomputed 13x13 patch each (B*68 small copies per
batch — microseconds against the ResNet forward; vectorize it before
believing it shows up in a profile).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from gan_control_tpu.losses.predictors.common import avg_pool
from gan_control_tpu.losses.predictors.resnet import (
    ResNetTrunk,
    bn_params,
    conv_w,
    convert_trunk,
)


class ResNetDepth(nn.Module):
    """[B, 256, 256, 71] -> [B, 68] landmark depths (crop units)."""

    layers: tuple = (3, 8, 36, 3)
    num_landmarks: int = 68

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        feats = ResNetTrunk(layers=self.layers, bottleneck=True,
                            name="trunk")(x)[-1]
        # reference avgpool is AvgPool2d(7) (stride=kernel) on the 8x8
        # stage-4 map -> a single 7x7 window, NOT a global mean
        pooled = avg_pool(feats, 7, 7)
        flat = pooled.reshape(pooled.shape[0], -1)
        w = self.param(
            "fc_w",
            nn.initializers.variance_scaling(2.0, "fan_in", "normal"),
            (flat.shape[-1], self.num_landmarks),
        )
        b = self.param("fc_b", nn.initializers.zeros, (self.num_landmarks,))
        return flat @ w.astype(flat.dtype) + b.astype(flat.dtype)


def _gaussian_patch(size: int = 13) -> np.ndarray:
    """utils._gaussian(size) exactly (utils.py:11-34): the patch's OWN
    sigma is the relative default 0.25*size (= 3.25 for the 13x13 window
    draw_gaussian requests with sigma=2 — the draw sigma only sizes the
    window), center at the 1-based coordinate 0.5*size + 0.5."""
    c = 0.5 * size + 0.5
    jj, ii = np.meshgrid(np.arange(size), np.arange(size))
    g = np.exp(-((((jj + 1 - c) / (0.25 * size)) ** 2
                  + ((ii + 1 - c) / (0.25 * size)) ** 2) / 2.0))
    return g.astype(np.float32)


def draw_gaussian_heatmaps(
    pts256: np.ndarray, resolution: int = 256, sigma: float = 2.0
) -> np.ndarray:
    """[B, L, 2] crop-space landmark coords -> [B, res, res, L] heatmaps.

    Vectorized utils.draw_gaussian: each landmark contributes one additive
    sigma=2 gaussian clipped to 1, skipped when its x <= 0 (api.py:171)
    or when the 6-sigma box misses the frame (utils.py:41-42). The
    reference's 1-indexed window arithmetic (floor(pt - 3*sigma) treated
    as a 1-based coordinate) is reproduced exactly so converted weights
    see bit-identical inputs."""
    pts = np.asarray(pts256, np.float64)
    b, n_lm = pts.shape[0], pts.shape[1]
    size = int(6 * sigma) + 1
    g = _gaussian_patch(size)
    out = np.zeros((b, resolution, resolution, n_lm), np.float32)
    ul = np.floor(pts - 3 * sigma).astype(np.int64)  # 1-based ul corner
    br = np.floor(pts + 3 * sigma).astype(np.int64)
    for bi in range(b):
        for li in range(n_lm):
            if pts[bi, li, 0] <= 0:
                continue
            ulx, uly = int(ul[bi, li, 0]), int(ul[bi, li, 1])
            brx, bry = int(br[bi, li, 0]), int(br[bi, li, 1])
            if (ulx > resolution or uly > resolution or brx < 1 or bry < 1):
                continue
            gx0 = max(1, -ulx)
            gx1 = min(brx, resolution) - max(1, ulx) + max(1, -ulx)
            gy0 = max(1, -uly)
            gy1 = min(bry, resolution) - max(1, uly) + max(1, -uly)
            ix0, ix1 = max(1, ulx), min(brx, resolution)
            iy0, iy1 = max(1, uly), min(bry, resolution)
            out[bi, iy0 - 1:iy1, ix0 - 1:ix1, li] += g[
                gy0 - 1:gy1, gx0 - 1:gx1
            ]
    return np.minimum(out, 1.0)


class DepthPredictor:
    """Crop + 2D landmarks -> per-landmark depth, one jitted forward."""

    def __init__(self, layers: tuple = (3, 8, 36, 3)):
        self.module = ResNetDepth(layers=layers)
        self._jit = None

    def init_params(self, rng):
        return self.module.init(rng, jnp.zeros((1, 256, 256, 71)))

    def predict(self, params, crops01: jax.Array,
                pts256: np.ndarray) -> np.ndarray:
        """crops01: [B,256,256,3] in [0,1] (the FAN input crop);
        pts256: [B,68,2] crop-space landmark coords. Returns [B,68]
        depths in crop units (caller applies the 200*scale/256 factor)."""
        if self._jit is None:
            self._jit = jax.jit(lambda p, v: self.module.apply(p, v))
        hm = draw_gaussian_heatmaps(pts256)
        inp = jnp.concatenate(
            [jnp.asarray(crops01, jnp.float32), jnp.asarray(hm)], axis=-1
        )
        return np.asarray(self._jit(params, inp))


def convert_torch_weights(path: str, layers: tuple = (3, 8, 36, 3)):
    """1adrianb depth checkpoint -> flax params.

    The download is a dict with a 'state_dict' whose keys carry a
    'module.' DataParallel prefix (api.py:86-91)."""
    import torch

    sd = torch.load(path, map_location="cpu")
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    sd = {k.replace("module.", ""): v for k, v in sd.items()}
    p = {"trunk": convert_trunk(sd, layers, bottleneck=True)}
    # stem bn lives inside convert_trunk; fc is torch Linear [out, in]
    p["fc_w"] = np.transpose(np.asarray(sd["fc.weight"]), (1, 0))
    p["fc_b"] = np.asarray(sd["fc.bias"])
    return {"params": jax.tree_util.tree_map(jnp.asarray, p)}
