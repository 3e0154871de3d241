"""BlazeFace face detector — flax port of the vendored MediaPipe detector.

Behavior contract (reference face-alignment/face_alignment/detection/blazeface/):
  - net_blazeface.py:7-42 (BlazeBlock): depthwise kxk conv + 1x1 pointwise,
    residual add with zero channel-padding; the stride-2 variant pads the
    conv input (0,2,0,2) TFLite-style and max-pools the residual.
  - net_blazeface.py:84-149 (BlazeFace): first 5x5 stride-2 conv with manual
    (1,2,1,2) pad, 11-block backbone1 -> 16x16x88, 5-block backbone2 ->
    8x8x96, 1x1 classifier/regressor heads over 896 anchors
    (16*16*2 + 8*8*6), coords = [cy, cx, h, w, 6x(kp_x, kp_y)] scaled by 128.
  - net_blazeface.py:240-282 (_tensors_to_detections): sigmoid scores with
    +-100 clipping, threshold 0.75 (detector wrapper uses 0.5,
    blazeface_detector.py:43), anchor-relative box/keypoint decode (:284-310).
  - net_blazeface.py:315-370 (_weighted_non_max_suppression): blending NMS —
    overlapping (IoU > 0.3) detections are averaged weighted by score; the
    blended score is mean of the overlapped scores.
  - detect.py:20-34: images are min-side center-cropped + resized to 128,
    boxes returned as (xmin, ymin, xmax, ymax, score) in original pixels.
  - The 896 SSD anchors ship as an external anchors.npy
    (blazeface_detector.py:21-23); here they are generated from the
    MediaPipe SSD anchor config (num_layers=4, strides 8/16/16/16,
    scales 0.1484375..0.75, aspect 1.0, interpolated scale, fixed size) so
    no download is needed — with fixed_anchor_size every anchor is
    (cx, cy, 1, 1) at grid-cell centers.

TPU-first: one jitted NHWC forward for the whole batch (depthwise convs map
to XLA feature_group_count); thresholding, decode and the data-dependent
blending NMS run host-side on tiny [896] arrays.
"""

from __future__ import annotations

import dataclasses
import math

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from gan_control_tpu.losses.predictors.common import Conv

INPUT_SIZE = 128
NUM_ANCHORS = 896
NUM_COORDS = 16
SCORE_CLIP = 100.0


def generate_anchors() -> np.ndarray:
    """MediaPipe SSD anchors for the 128x128 front-camera face model.

    Returns [896, 4] of (x_center, y_center, w, h) in [0,1]; w = h = 1
    because fixed_anchor_size=True. Layer merging follows the calculator:
    layers sharing a stride contribute their scales to one grid.
    """
    strides = [8, 16, 16, 16]
    min_scale, max_scale = 0.1484375, 0.75
    n = len(strides)
    anchors = []
    layer_id = 0
    while layer_id < n:
        scales = []
        last = layer_id
        while last < n and strides[last] == strides[layer_id]:
            scale = min_scale + (max_scale - min_scale) * last / (n - 1)
            scales.append(scale)
            next_scale = (
                1.0
                if last == n - 1
                else min_scale + (max_scale - min_scale) * (last + 1) / (n - 1)
            )
            scales.append(math.sqrt(scale * next_scale))  # interpolated aspect 1.0
            last += 1
        fm = int(math.ceil(INPUT_SIZE / strides[layer_id]))
        for y in range(fm):
            for x in range(fm):
                for _ in scales:
                    anchors.append([(x + 0.5) / fm, (y + 0.5) / fm, 1.0, 1.0])
        layer_id = last
    out = np.asarray(anchors, np.float32)
    assert out.shape == (NUM_ANCHORS, 4), out.shape
    return out


def _depthwise(x: jax.Array, w: jax.Array, b: jax.Array, *, stride: int,
               pad) -> jax.Array:
    """Depthwise conv, NHWC; w: [kh, kw, 1, C]."""
    y = jax.lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(stride, stride),
        padding=pad,
        feature_group_count=x.shape[-1],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + b.astype(x.dtype)


class BlazeBlock(nn.Module):
    """reference net_blazeface.py:7-42."""

    out_channels: int
    kernel_size: int = 3
    stride: int = 1

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c_in = x.shape[-1]
        k = self.kernel_size
        dw_w = self.param(
            "dw_weight",
            nn.initializers.variance_scaling(2.0, "fan_in", "normal"),
            (k, k, 1, c_in),
        )
        dw_b = self.param("dw_bias", nn.initializers.zeros, (c_in,))
        if self.stride == 2:
            # TFLite pads right/bottom by 2 before the stride-2 conv; the
            # residual is 2x2 max-pooled.
            h = _depthwise(x, dw_w, dw_b, stride=2, pad=((0, 2), (0, 2)))
            res = nn.max_pool(x, (2, 2), strides=(2, 2))
        else:
            p = (k - 1) // 2
            h = _depthwise(x, dw_w, dw_b, stride=1, pad=((p, p), (p, p)))
            res = x
        h = Conv(self.out_channels, 1, name="pw")(h)
        if self.out_channels > c_in:
            res = jnp.pad(res, ((0, 0), (0, 0), (0, 0), (0, self.out_channels - c_in)))
        return jax.nn.relu(h + res)


class BlazeFaceNet(nn.Module):
    """[B,128,128,3] in [-1,1] -> (raw_boxes [B,896,16], raw_scores [B,896,1])."""

    @nn.compact
    def __call__(self, x: jax.Array):
        b = x.shape[0]
        x = jnp.pad(x, ((0, 0), (1, 2), (1, 2), (0, 0)))
        x = jax.nn.relu(Conv(24, 5, stride=2, name="conv0")(x))
        specs1 = [(24, 1), (28, 1), (32, 2), (36, 1), (42, 1), (48, 2),
                  (56, 1), (64, 1), (72, 1), (80, 1), (88, 1)]
        for i, (ch, st) in enumerate(specs1):
            x = BlazeBlock(ch, stride=st, name=f"b1_{i}")(x)
        h = x  # [B,16,16,88]
        for i, (ch, st) in enumerate([(96, 2), (96, 1), (96, 1), (96, 1), (96, 1)]):
            h = BlazeBlock(ch, stride=st, name=f"b2_{i}")(h)
        # heads; NHWC already matches the reference's permute-then-reshape
        c1 = Conv(2, 1, name="classifier_8")(x).reshape(b, -1, 1)
        c2 = Conv(6, 1, name="classifier_16")(h).reshape(b, -1, 1)
        r1 = Conv(32, 1, name="regressor_8")(x).reshape(b, -1, NUM_COORDS)
        r2 = Conv(96, 1, name="regressor_16")(h).reshape(b, -1, NUM_COORDS)
        return (
            jnp.concatenate([r1, r2], axis=1),
            jnp.concatenate([c1, c2], axis=1),
        )


def decode_boxes(raw: np.ndarray, anchors: np.ndarray) -> np.ndarray:
    """reference net_blazeface.py:284-310; raw [N,896,16] -> same shape with
    (ymin, xmin, ymax, xmax, 6x(kp_x, kp_y)) in [0,1]-relative units."""
    s = float(INPUT_SIZE)
    out = np.empty_like(raw)
    cx = raw[..., 0] / s * anchors[:, 2] + anchors[:, 0]
    cy = raw[..., 1] / s * anchors[:, 3] + anchors[:, 1]
    w = raw[..., 2] / s * anchors[:, 2]
    h = raw[..., 3] / s * anchors[:, 3]
    out[..., 0] = cy - h / 2.0
    out[..., 1] = cx - w / 2.0
    out[..., 2] = cy + h / 2.0
    out[..., 3] = cx + w / 2.0
    for k in range(6):
        o = 4 + k * 2
        out[..., o] = raw[..., o] / s * anchors[:, 2] + anchors[:, 0]
        out[..., o + 1] = raw[..., o + 1] / s * anchors[:, 3] + anchors[:, 1]
    return out


def _iou(box: np.ndarray, boxes: np.ndarray) -> np.ndarray:
    tl = np.maximum(box[:2], boxes[:, :2])
    br = np.minimum(box[2:4], boxes[:, 2:4])
    inter = np.prod(np.clip(br - tl, 0, None), axis=-1)
    a = np.prod(box[2:4] - box[:2])
    b = np.prod(boxes[:, 2:4] - boxes[:, :2], axis=-1)
    return inter / np.maximum(a + b - inter, 1e-12)


def weighted_nms(dets: np.ndarray, iou_thresh: float = 0.3) -> np.ndarray:
    """Blending NMS (reference net_blazeface.py:315-370). dets: [N,17]
    (16 coords + score), returns [M,17] blended detections."""
    if len(dets) == 0:
        return np.zeros((0, 17), np.float32)
    out = []
    remaining = np.argsort(-dets[:, 16])
    while len(remaining):
        first = dets[remaining[0]]
        ious = _iou(first[:4], dets[remaining, :4])
        mask = ious > iou_thresh
        # the head always leaves `remaining` (its self-IoU is 1 for any real
        # box; degenerate boxes from untrained weights would otherwise spin)
        mask[0] = True
        overlapping = remaining[mask]
        remaining = remaining[~mask]
        blended = first.copy()
        if len(overlapping) > 1:
            coords = dets[overlapping, :16]
            scores = dets[overlapping, 16:17]
            blended[:16] = (coords * scores).sum(axis=0) / max(scores.sum(), 1e-20)
            blended[16] = scores.sum() / len(overlapping)
        out.append(blended)
    return np.stack(out).astype(np.float32)


def _resize_area(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Host-side resize via PIL (reference uses cv2 INTER_AREA,
    utils.py:5-34; PIL BOX is the same box-filter average on downscale).
    cv2 INTER_AREA degrades to bilinear when UPSCALING, so inputs smaller
    than the target use PIL BILINEAR to match."""
    from PIL import Image

    in_h, in_w = img.shape[:2]
    mode = Image.BILINEAR if (out_h > in_h or out_w > in_w) else Image.BOX
    pil = Image.fromarray(img.astype(np.uint8))
    return np.asarray(pil.resize((out_w, out_h), mode), np.float32)


def resize_and_crop_image(image: np.ndarray, dim: int = INPUT_SIZE):
    """Min-side center crop + resize (reference utils.py:37-49). Returns
    (img [dim,dim,3], (xshift, yshift)) with shifts in original pixels."""
    h, w = image.shape[:2]
    if h > w:
        new_h = int(h * dim / float(w))
        img = _resize_area(image, new_h, dim)
        yshift, xshift = (h - w) // 2, 0
        y0 = (img.shape[0] - img.shape[1]) // 2
        return img[y0:y0 + dim, :, :], (xshift, yshift)
    new_w = int(w * dim / float(h))
    img = _resize_area(image, dim, new_w)
    yshift, xshift = 0, (w - h) // 2
    x0 = (img.shape[1] - img.shape[0]) // 2
    return img[:, x0:x0 + dim, :], (xshift, yshift)


@dataclasses.dataclass
class BlazeFaceDetector:
    """Mirror of SFDDetector's API: detect() returns per-image
    [K, 5] = (xmin, ymin, xmax, ymax, score) boxes in input pixels
    (reference detect.py:20-34 coordinate un-swap included)."""

    params: dict
    min_score_thresh: float = 0.5  # blazeface_detector.py:43
    iou_thresh: float = 0.3

    def __post_init__(self):
        self._net = BlazeFaceNet()
        self._anchors = generate_anchors()
        self._fwd = jax.jit(lambda p, x: self._net.apply(p, x))

    @classmethod
    def init_random(cls, rng=None, **kw):
        rng = jax.random.PRNGKey(0) if rng is None else rng
        net = BlazeFaceNet()
        params = net.init(rng, jnp.zeros((1, INPUT_SIZE, INPUT_SIZE, 3)))
        return cls(params=params, **kw)

    def detect(self, images_rgb_u8: np.ndarray) -> list[np.ndarray]:
        """images: [N, H, W, 3] uint8 RGB (H, W arbitrary, square-cropped)."""
        crops, shifts = [], []
        for img in images_rgb_u8:
            crop, shift = resize_and_crop_image(np.asarray(img))
            crops.append(crop / 127.5 - 1.0)
            shifts.append(shift)
        x = jnp.asarray(np.stack(crops), jnp.float32)
        raw_box, raw_score = self._fwd(self.params, x)
        raw_box = np.asarray(raw_box, np.float32)
        clipped = np.clip(np.asarray(raw_score, np.float32), -SCORE_CLIP, SCORE_CLIP)
        # numerically stable sigmoid: exp of a NEGATIVE magnitude only
        # (exp(100) overflows float32; the reference rode the resulting inf)
        scores = np.where(
            clipped >= 0,
            1.0 / (1.0 + np.exp(-np.abs(clipped))),
            np.exp(-np.abs(clipped)) / (1.0 + np.exp(-np.abs(clipped))),
        )[..., 0]
        boxes = decode_boxes(raw_box, self._anchors)
        results = []
        for i, img in enumerate(images_rgb_u8):
            keep = scores[i] >= self.min_score_thresh
            dets = np.concatenate(
                [boxes[i, keep], scores[i, keep, None]], axis=-1
            )
            faces = weighted_nms(dets, self.iou_thresh)
            orig = float(min(img.shape[0], img.shape[1]))
            xs, ys = shifts[i]
            if len(faces) == 0:
                results.append(np.zeros((0, 5), np.float32))
                continue
            # (ymin,xmin,ymax,xmax) -> (xmin,ymin,xmax,ymax) in orig pixels
            locs = faces[:, [1, 0, 3, 2]] * orig + np.array(
                [xs, ys, xs, ys], np.float32
            )
            results.append(
                np.concatenate([locs, faces[:, 16:17]], axis=-1).astype(np.float32)
            )
        return results


def convert_torch_weights(path: str):
    """hollance/BlazeFace-PyTorch ``blazeface.pth`` state_dict -> flax params.

    torch key layout (net_blazeface.py:84-115): ``backbone1.{idx}`` where
    idx 0 is the first conv, 2.. are BlazeBlocks holding ``convs.0``
    (depthwise [C,1,k,k]) and ``convs.1`` (pointwise); ``backbone2.{idx}``;
    1x1 heads ``classifier_8/16``, ``regressor_8/16``."""
    import torch

    sd = torch.load(path, map_location="cpu")
    return convert_state_dict(sd)


def convert_state_dict(sd) -> dict:
    def conv_w(t):  # OIHW -> HWIO
        return np.asarray(t).transpose(2, 3, 1, 0)

    def dw_w(t):  # [C,1,k,k] -> [k,k,1,C]
        return np.asarray(t).transpose(2, 3, 1, 0)

    p: dict = {
        "conv0": {"weight": conv_w(sd["backbone1.0.weight"]),
                  "bias": np.asarray(sd["backbone1.0.bias"])},
    }
    for name, torch_prefix, count, base in (
        ("b1", "backbone1", 11, 2),
        ("b2", "backbone2", 5, 0),
    ):
        for i in range(count):
            tp = f"{torch_prefix}.{base + i}"
            p[f"{name}_{i}"] = {
                "dw_weight": dw_w(sd[f"{tp}.convs.0.weight"]),
                "dw_bias": np.asarray(sd[f"{tp}.convs.0.bias"]),
                "pw": {"weight": conv_w(sd[f"{tp}.convs.1.weight"]),
                       "bias": np.asarray(sd[f"{tp}.convs.1.bias"])},
            }
    for head in ("classifier_8", "classifier_16", "regressor_8", "regressor_16"):
        p[head] = {"weight": conv_w(sd[f"{head}.weight"]),
                   "bias": np.asarray(sd[f"{head}.bias"])}
    return {"params": jax.tree_util.tree_map(jnp.asarray, p)}
