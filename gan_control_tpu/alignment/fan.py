"""FAN (Face Alignment Network) — stacked-hourglass landmark detector, flax.

Behavior contract (reference face-alignment/face_alignment/models.py):
  - ConvBlock (:13-55): pre-activation BN-relu-conv chain producing
    [out/2, out/4, out/4] channel splits concatenated, with a BN-relu-1x1
    downsample residual when channels change.
  - HourGlass (:98-143): recursive depth-4 encoder/decoder at 256 features
    (avg-pool down, nearest-neighbor 2x up, skip adds).
  - FAN (:145-201): 7x7/2 stem -> ConvBlocks 128/128/256 with an avg-pool
    -> num_modules stacked hourglasses, each emitting 68 heatmaps (64x64
    for 256 input); intermediate supervision feeds back via 1x1 convs.
  - heatmap decoding (face_alignment/utils.get_preds_fromhm): argmax +
    0.25-pixel shift toward the stronger neighbor.

Weights: 1adrianb 2DFAN-4 / 3DFAN-4 checkpoints (external downloads);
convert_torch_weights maps their module naming."""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from gan_control_tpu.losses.predictors.common import (
    Conv,
    FrozenBatchNorm,
    avg_pool,
    resize_bilinear,
)


class ConvBlock(nn.Module):
    out_planes: int

    @nn.compact
    def __call__(self, x):
        in_planes = x.shape[-1]
        o2, o4 = self.out_planes // 2, self.out_planes // 4
        y1 = Conv(o2, 3, padding=1, use_bias=False, name="conv1")(
            jax.nn.relu(FrozenBatchNorm(in_planes, name="bn1")(x))
        )
        y2 = Conv(o4, 3, padding=1, use_bias=False, name="conv2")(
            jax.nn.relu(FrozenBatchNorm(o2, name="bn2")(y1))
        )
        y3 = Conv(o4, 3, padding=1, use_bias=False, name="conv3")(
            jax.nn.relu(FrozenBatchNorm(o4, name="bn3")(y2))
        )
        out = jnp.concatenate([y1, y2, y3], axis=-1)
        if in_planes != self.out_planes:
            res = Conv(self.out_planes, 1, use_bias=False, name="down_conv")(
                jax.nn.relu(FrozenBatchNorm(in_planes, name="down_bn")(x))
            )
        else:
            res = x
        return out + res


class HourGlass(nn.Module):
    depth: int = 4
    features: int = 256

    @nn.compact
    def __call__(self, x):
        def level(lv, inp):
            up1 = ConvBlock(self.features, name=f"b1_{lv}")(inp)
            low1 = avg_pool(inp, 2, 2)
            low1 = ConvBlock(self.features, name=f"b2_{lv}")(low1)
            if lv > 1:
                low2 = level(lv - 1, low1)
            else:
                low2 = ConvBlock(self.features, name=f"b2_plus_{lv}")(low1)
            low3 = ConvBlock(self.features, name=f"b3_{lv}")(low2)
            # nearest-neighbor 2x upsample
            b, h, w, c = low3.shape
            up2 = jnp.repeat(jnp.repeat(low3, 2, axis=1), 2, axis=2)
            return up1 + up2

        return level(self.depth, x)


class FANNet(nn.Module):
    num_modules: int = 4
    num_landmarks: int = 68

    @nn.compact
    def __call__(self, x):
        """x: [B, 256, 256, 3] in [0,1]. Returns list of [B,64,64,68]."""
        x = Conv(64, 7, stride=2, padding=3, name="conv1")(x)
        x = jax.nn.relu(FrozenBatchNorm(64, name="bn1")(x))
        x = ConvBlock(128, name="conv2")(x)
        x = avg_pool(x, 2, 2)
        x = ConvBlock(128, name="conv3")(x)
        x = ConvBlock(256, name="conv4")(x)

        previous = x
        outputs = []
        for i in range(self.num_modules):
            hg = HourGlass(name=f"m{i}")(previous)
            ll = ConvBlock(256, name=f"top_m_{i}")(hg)
            ll = Conv(256, 1, name=f"conv_last{i}")(ll)
            ll = jax.nn.relu(FrozenBatchNorm(256, name=f"bn_end{i}")(ll))
            tmp_out = Conv(self.num_landmarks, 1, name=f"l{i}")(ll)
            outputs.append(tmp_out)
            if i < self.num_modules - 1:
                ll = Conv(256, 1, name=f"bl{i}")(ll)
                tmp_out_ = Conv(256, 1, name=f"al{i}")(tmp_out)
                previous = previous + ll + tmp_out_
        return outputs


def decode_heatmaps(heatmaps: np.ndarray) -> np.ndarray:
    """[B,64,64,L] -> [B,L,2] (x, y) in heatmap pixels with the reference's
    quarter-pixel neighbor shift (face_alignment/utils.get_preds_fromhm)."""
    hm = np.asarray(heatmaps)
    b, h, w, l = hm.shape
    flat = hm.transpose(0, 3, 1, 2).reshape(b, l, -1)
    idx = flat.argmax(axis=-1)
    ys, xs = np.divmod(idx, w)
    coords = np.stack([xs, ys], axis=-1).astype(np.float32)
    for bi in range(b):
        for li in range(l):
            x, y = int(xs[bi, li]), int(ys[bi, li])
            m = hm[bi, :, :, li]
            if 0 < x < w - 1:
                coords[bi, li, 0] += 0.25 * np.sign(m[y, x + 1] - m[y, x - 1])
            if 0 < y < h - 1:
                coords[bi, li, 1] += 0.25 * np.sign(m[y + 1, x] - m[y - 1, x])
    return coords + 0.5


def box_to_center_scale(box, reference_scale: float = 195.0):
    """Detector box -> (center, scale) exactly like the reference pipeline
    (api.py: center.y -= 0.12*box_h; scale = (w+h)/reference_scale, with
    SFD's reference_scale=195)."""
    x1, y1, x2, y2 = [float(v) for v in box]
    center = np.array([(x1 + x2) / 2.0, (y1 + y2) / 2.0 - (y2 - y1) * 0.12])
    scale = ((x2 - x1) + (y2 - y1)) / reference_scale
    return center, scale


def _transform_pt(point, center, scale, resolution: float,
                  invert: bool = False) -> np.ndarray:
    """The reference's affine transform between original-image space and
    the crop/heatmap space (face_alignment/utils.transform), including its
    integer truncation of the result."""
    h = 200.0 * scale
    if invert:
        x = point[0] * h / resolution + center[0] - h / 2.0
        y = point[1] * h / resolution + center[1] - h / 2.0
    else:
        x = point[0] * resolution / h + resolution * (-center[0] / h + 0.5)
        y = point[1] * resolution / h + resolution * (-center[1] / h + 0.5)
    return np.array([int(x), int(y)], np.int64)


class FAN:
    """Inference wrapper: images -> 68 2-D landmarks in image pixels.

    Reproduces the reference crop geometry (face_alignment/api.py +
    utils.crop): the face box maps to (center, scale) with a 0.12*h upward
    shift and scale=(w+h)/195, the 256-crop spans 200*scale original
    pixels around the center (zero-padded outside the frame), and the
    64-space heatmap peaks map back through the inverse transform. Without
    a detector the WHOLE image is the box — the centered-face assumption
    of generator output (phase-2a), which in the reference geometry means
    a ~2.05x zoomed-out, 0.12-shifted window, NOT a bare full-frame
    resize."""

    def __init__(self, num_modules: int = 4):
        self.module = FANNet(num_modules=num_modules)
        self._jit = None

    def init_params(self, rng):
        return self.module.init(rng, jnp.zeros((1, 256, 256, 3)))

    def _crop(self, x01: np.ndarray, center, scale) -> jax.Array:
        """utils.crop for a batch sharing one (center, scale): zero-padded
        window [ul, br) resized to 256 (cv2 INTER_LINEAR ==
        align_corners=False bilinear)."""
        b, ht, wd, c = x01.shape
        ul = _transform_pt([1, 1], center, scale, 256.0, invert=True)
        br = _transform_pt([256, 256], center, scale, 256.0, invert=True)
        canvas = np.zeros((b, br[1] - ul[1], br[0] - ul[0], c), x01.dtype)
        new_x = (max(1, -ul[0] + 1), min(br[0], wd) - ul[0])
        new_y = (max(1, -ul[1] + 1), min(br[1], ht) - ul[1])
        old_x = (max(1, ul[0] + 1), min(br[0], wd))
        old_y = (max(1, ul[1] + 1), min(br[1], ht))
        canvas[:, new_y[0] - 1:new_y[1], new_x[0] - 1:new_x[1]] = \
            x01[:, old_y[0] - 1:old_y[1], old_x[0] - 1:old_x[1]]
        return resize_bilinear(jnp.asarray(canvas), (256, 256),
                               align_corners=False)

    def get_landmarks(self, params, images: jax.Array, boxes=None,
                      depth=None, depth_params=None) -> np.ndarray:
        """images [-1,1] NHWC -> [B,68,2] pixel coords (original frame),
        or [B,68,3] when a depth predictor is given.

        ``boxes``: optional per-image (x1,y1,x2,y2) detector boxes; None =
        whole-image box per image.
        ``depth``/``depth_params``: optional ``DepthPredictor`` — appends
        the reference LandmarksType._3D z coordinate per landmark
        (api.py:168-182: heatmaps at crop res from the 64-space peaks x4,
        depth output rescaled by 200*scale/256 into image units)."""
        if self._jit is None:
            self._jit = jax.jit(lambda p, v: self.module.apply(p, v)[-1])
        x01 = np.asarray(images * 0.5 + 0.5)
        b, ht, wd = x01.shape[0], x01.shape[1], x01.shape[2]

        def finish(crop, coords64, center, scale):
            """64-space peaks -> image-frame landmarks [N,68,2|3]."""
            h200 = 200.0 * scale
            xy = np.floor(
                coords64 * (h200 / 64.0) + np.asarray(center) - h200 / 2.0
            ).astype(np.float32)  # the reference transform truncates
            if depth is None:
                return xy
            z = depth.predict(depth_params, crop, coords64 * 4.0)
            return np.concatenate(
                [xy, (z * (h200 / 256.0))[..., None]], axis=-1
            ).astype(np.float32)

        if boxes is None:
            center, scale = box_to_center_scale((0.0, 0.0, wd, ht))
            crop = self._crop(x01, center, scale)
            hm = self._jit(params, crop)
            coords = decode_heatmaps(np.asarray(hm))  # 64-space, float
            return finish(crop, coords, center, scale)

        out = np.zeros((b, 68, 3 if depth is not None else 2), np.float32)
        for i, box in enumerate(boxes):
            center, scale = box_to_center_scale(box)
            crop = self._crop(x01[i:i + 1], center, scale)
            hm = self._jit(params, crop)
            coords = decode_heatmaps(np.asarray(hm))
            out[i] = finish(crop, coords, center, scale)[0]
        return out


def convert_torch_weights(path: str, num_modules: int = 4):
    """1adrianb FAN checkpoint -> flax params."""
    import torch

    from gan_control_tpu.losses.predictors.resnet import bn_params, conv_w

    sd = torch.load(path, map_location="cpu")
    if not isinstance(sd, dict):
        raise ValueError(
            f"unsupported FAN checkpoint at {path!r}: expected a state_dict "
            f"(got {type(sd).__name__})"
        )
    if "conv1.weight" not in sd:
        sd = sd.get("state_dict", sd)

    def convblock(prefix):
        blk = {}
        for c in range(1, 4):
            blk[f"conv{c}"] = {"weight": conv_w(sd[f"{prefix}.conv{c}.weight"])}
            blk[f"bn{c}"] = bn_params(sd, f"{prefix}.bn{c}")
        if f"{prefix}.downsample.2.weight" in sd:
            blk["down_bn"] = bn_params(sd, f"{prefix}.downsample.0")
            blk["down_conv"] = {"weight": conv_w(sd[f"{prefix}.downsample.2.weight"])}
        return blk

    p: dict = {
        "conv1": {"weight": conv_w(sd["conv1.weight"]),
                  "bias": np.asarray(sd["conv1.bias"])},
        "bn1": bn_params(sd, "bn1"),
        "conv2": convblock("conv2"),
        "conv3": convblock("conv3"),
        "conv4": convblock("conv4"),
    }
    for i in range(num_modules):
        hg = {}
        for lv in range(1, 5):
            hg[f"b1_{lv}"] = convblock(f"m{i}.b1_{lv}")
            hg[f"b2_{lv}"] = convblock(f"m{i}.b2_{lv}")
            hg[f"b3_{lv}"] = convblock(f"m{i}.b3_{lv}")
            if f"m{i}.b2_plus_{lv}.conv1.weight" in sd:
                hg[f"b2_plus_{lv}"] = convblock(f"m{i}.b2_plus_{lv}")
        p[f"m{i}"] = hg
        p[f"top_m_{i}"] = convblock(f"top_m_{i}")
        p[f"conv_last{i}"] = {
            "weight": conv_w(sd[f"conv_last{i}.weight"]),
            "bias": np.asarray(sd[f"conv_last{i}.bias"]),
        }
        p[f"bn_end{i}"] = bn_params(sd, f"bn_end{i}")
        p[f"l{i}"] = {"weight": conv_w(sd[f"l{i}.weight"]),
                      "bias": np.asarray(sd[f"l{i}.bias"])}
        if i < num_modules - 1:
            p[f"bl{i}"] = {"weight": conv_w(sd[f"bl{i}.weight"]),
                           "bias": np.asarray(sd[f"bl{i}.bias"])}
            p[f"al{i}"] = {"weight": conv_w(sd[f"al{i}.weight"]),
                           "bias": np.asarray(sd[f"al{i}.bias"])}
    return {"params": jax.tree_util.tree_map(jnp.asarray, p)}
