"""S3FD face detector — flax port of the vendored SFD detector.

Behavior contract (reference face-alignment/face_alignment/detection/sfd/):
  - net_s3fd.py: VGG16 trunk (convs 1_1..5_3 with 2x2 maxpools), fc6 (3x3
    conv pad 3) + fc7 (1x1), extra convs 6_1/6_2 and 7_1/7_2 (stride 2);
    L2Norm layers on conv3_3/4_3/5_3 (scales 10/8/5); six (conf, loc) head
    pairs at strides 4..128; the stride-4 conf applies max-out over the
    first three background channels (:124-128).
  - detect.py: input is RGB minus (104, 117, 123) IN BGR ORDER? — the
    reference subtracts the BGR ImageNet means from an RGB-loaded image
    as-is (:20); this port reproduces that behavior byte-for-byte.
  - bbox.py: anchor decode (variances 0.1/0.2, prior size 4*stride) and
    greedy IoU NMS.

TPU-first: the conv net is one jitted forward; candidate thresholding,
decode and NMS run host-side in numpy (tiny arrays)."""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from gan_control_tpu.losses.predictors.common import Conv, max_pool

BGR_MEANS = np.array([104.0, 117.0, 123.0], np.float32)


class L2Norm(nn.Module):
    channels: int
    scale: float

    @nn.compact
    def __call__(self, x):
        w = self.param(
            "weight", lambda k, s: jnp.full(s, self.scale, jnp.float32), (self.channels,)
        )
        norm = jnp.sqrt(jnp.sum(jnp.square(x), axis=-1, keepdims=True)) + 1e-10
        return x / norm * w.astype(x.dtype)


class S3FD(nn.Module):
    """[B,H,W,3] (mean-subtracted) -> [(conf, loc)] x 6 NHWC head outputs."""

    @nn.compact
    def __call__(self, x):
        def block(x, chans, names):
            for ch, name in zip(chans, names):
                x = jax.nn.relu(Conv(ch, 3, padding=1, name=name)(x))
            return x

        h = block(x, (64, 64), ("conv1_1", "conv1_2"))
        h = max_pool(h, 2, 2)
        h = block(h, (128, 128), ("conv2_1", "conv2_2"))
        h = max_pool(h, 2, 2)
        h = block(h, (256, 256, 256), ("conv3_1", "conv3_2", "conv3_3"))
        f3_3 = h
        h = max_pool(h, 2, 2)
        h = block(h, (512, 512, 512), ("conv4_1", "conv4_2", "conv4_3"))
        f4_3 = h
        h = max_pool(h, 2, 2)
        h = block(h, (512, 512, 512), ("conv5_1", "conv5_2", "conv5_3"))
        f5_3 = h
        h = max_pool(h, 2, 2)
        h = jax.nn.relu(Conv(1024, 3, padding=3, name="fc6")(h))
        h = jax.nn.relu(Conv(1024, 1, name="fc7")(h))
        ffc7 = h
        h = jax.nn.relu(Conv(256, 1, name="conv6_1")(h))
        h = jax.nn.relu(Conv(512, 3, stride=2, padding=1, name="conv6_2")(h))
        f6_2 = h
        h = jax.nn.relu(Conv(128, 1, name="conv7_1")(h))
        h = jax.nn.relu(Conv(256, 3, stride=2, padding=1, name="conv7_2")(h))
        f7_2 = h

        f3_3 = L2Norm(256, 10.0, name="conv3_3_norm")(f3_3)
        f4_3 = L2Norm(512, 8.0, name="conv4_3_norm")(f4_3)
        f5_3 = L2Norm(512, 5.0, name="conv5_3_norm")(f5_3)

        heads = []
        cls1 = Conv(4, 3, padding=1, name="conv3_3_norm_mbox_conf")(f3_3)
        reg1 = Conv(4, 3, padding=1, name="conv3_3_norm_mbox_loc")(f3_3)
        # max-out background label over the first 3 channels
        bmax = jnp.maximum(jnp.maximum(cls1[..., 0], cls1[..., 1]), cls1[..., 2])
        cls1 = jnp.stack([bmax, cls1[..., 3]], axis=-1)
        heads.append((cls1, reg1))
        for feat, ch, name in (
            (f4_3, 512, "conv4_3_norm"),
            (f5_3, 512, "conv5_3_norm"),
            (ffc7, 1024, "fc7"),
            (f6_2, 512, "conv6_2"),
            (f7_2, 256, "conv7_2"),
        ):
            conf = Conv(2, 3, padding=1, name=f"{name}_mbox_conf")(feat)
            loc = Conv(4, 3, padding=1, name=f"{name}_mbox_loc")(feat)
            heads.append((conf, loc))
        return heads


def decode_boxes(loc: np.ndarray, priors: np.ndarray,
                 variances=(0.1, 0.2)) -> np.ndarray:
    """Anchor decode (reference bbox.decode)."""
    boxes = np.concatenate(
        [
            priors[:, :2] + loc[:, :2] * variances[0] * priors[:, 2:],
            priors[:, 2:] * np.exp(loc[:, 2:] * variances[1]),
        ],
        axis=1,
    )
    boxes[:, :2] -= boxes[:, 2:] / 2
    boxes[:, 2:] += boxes[:, :2]
    return boxes


def nms(dets: np.ndarray, thresh: float = 0.3) -> list[int]:
    """Greedy IoU NMS (reference bbox.nms)."""
    if len(dets) == 0:
        return []
    x1, y1, x2, y2, scores = dets.T
    areas = (x2 - x1 + 1) * (y2 - y1 + 1)
    order = scores.argsort()[::-1]
    keep = []
    while order.size > 0:
        i = order[0]
        keep.append(int(i))
        xx1 = np.maximum(x1[i], x1[order[1:]])
        yy1 = np.maximum(y1[i], y1[order[1:]])
        xx2 = np.minimum(x2[i], x2[order[1:]])
        yy2 = np.minimum(y2[i], y2[order[1:]])
        w = np.maximum(0.0, xx2 - xx1 + 1)
        h = np.maximum(0.0, yy2 - yy1 + 1)
        ovr = w * h / (areas[i] + areas[order[1:]] - w * h)
        order = order[np.where(ovr <= thresh)[0] + 1]
    return keep


@dataclasses.dataclass
class SFDDetector:
    """detect(images) -> per-image [N,5] (x1,y1,x2,y2,score) arrays."""

    params: dict
    conf_thresh: float = 0.05
    nms_thresh: float = 0.3
    filter_thresh: float = 0.5

    def __post_init__(self):
        self.module = S3FD()
        self._jit = jax.jit(lambda p, v: self.module.apply(p, v))

    @classmethod
    def init_random(cls, rng=None, **kw):
        m = S3FD()
        p = m.init(rng or jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
        return cls(params=p, **kw)

    def detect(self, images_rgb_u8: np.ndarray) -> list[np.ndarray]:
        """images: [B,H,W,3] uint8/float RGB in [0,255]."""
        # the reference flips RGB->BGR BEFORE detection (api.py:140
        # detect_from_image(image[..., ::-1])) and THEN subtracts the
        # Caffe BGR means — the converted s3fd weights expect BGR input
        x = jnp.asarray(images_rgb_u8, jnp.float32)[..., ::-1] - BGR_MEANS
        heads = self._jit(self.params, x)
        heads = [(np.asarray(c), np.asarray(r)) for c, r in heads]
        out = []
        for b in range(x.shape[0]):
            dets = []
            for i, (conf, loc) in enumerate(heads):
                stride = 2 ** (i + 2)
                prob = _softmax2(conf[b])[..., 1]
                hi, wi = np.where(prob > self.conf_thresh)
                for hh, ww in zip(hi, wi):
                    axc = stride / 2 + ww * stride
                    ayc = stride / 2 + hh * stride
                    prior = np.array([[axc, ayc, stride * 4, stride * 4]], np.float64)
                    box = decode_boxes(loc[b, hh, ww][None], prior)[0]
                    dets.append([*box, prob[hh, ww]])
            dets = np.array(dets) if dets else np.zeros((0, 5))
            if len(dets):
                dets = dets[nms(dets, self.nms_thresh)]
                dets = dets[dets[:, 4] >= self.filter_thresh]
            out.append(dets)
        return out


def _softmax2(conf: np.ndarray) -> np.ndarray:
    e = np.exp(conf - conf.max(axis=-1, keepdims=True))
    return e / e.sum(axis=-1, keepdims=True)


def convert_torch_weights(path: str):
    """s3fd torch checkpoint -> flax params (names match 1:1)."""
    import torch

    from gan_control_tpu.losses.predictors.resnet import conv_w

    sd = torch.load(path, map_location="cpu")
    p: dict = {}
    for key in sd:
        if key.endswith(".weight") and sd[key].ndim == 4:
            name = key[: -len(".weight")]
            p.setdefault(name, {})["weight"] = conv_w(sd[key])
        elif key.endswith(".bias"):
            name = key[: -len(".bias")]
            p.setdefault(name, {})["bias"] = np.asarray(sd[key])
        elif key.endswith(".weight"):  # L2Norm scales
            name = key[: -len(".weight")]
            p.setdefault(name, {})["weight"] = np.asarray(sd[key])
    return {"params": jax.tree_util.tree_map(jnp.asarray, p)}
