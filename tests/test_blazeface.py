"""BlazeFace detector: torch-oracle parity + anchors + blending-NMS contract.

Oracle is a hand-built torch net with the reference's module naming
(face-alignment/face_alignment/detection/blazeface/net_blazeface.py:7-149) so
`convert_state_dict` is exercised on the real key layout."""

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax.numpy as jnp

from gan_control_tpu.alignment.blazeface import (
    BlazeFaceDetector,
    BlazeFaceNet,
    convert_state_dict,
    decode_boxes,
    generate_anchors,
    resize_and_crop_image,
    weighted_nms,
)


class TorchBlazeBlock(nn.Module):
    def __init__(self, c_in, c_out, kernel_size=3, stride=1):
        super().__init__()
        self.stride = stride
        self.channel_pad = c_out - c_in
        padding = 0 if stride == 2 else (kernel_size - 1) // 2
        self.convs = nn.Sequential(
            nn.Conv2d(c_in, c_in, kernel_size, stride, padding, groups=c_in),
            nn.Conv2d(c_in, c_out, 1),
        )

    def forward(self, x):
        if self.stride == 2:
            h = F.pad(x, (0, 2, 0, 2))
            x = F.max_pool2d(x, 2, 2)
        else:
            h = x
        if self.channel_pad > 0:
            x = F.pad(x, (0, 0, 0, 0, 0, self.channel_pad))
        return F.relu(self.convs(h) + x)


class TorchBlazeFace(nn.Module):
    def __init__(self):
        super().__init__()
        self.backbone1 = nn.Sequential(
            nn.Conv2d(3, 24, 5, 2, 0), nn.ReLU(),
            TorchBlazeBlock(24, 24), TorchBlazeBlock(24, 28),
            TorchBlazeBlock(28, 32, stride=2), TorchBlazeBlock(32, 36),
            TorchBlazeBlock(36, 42), TorchBlazeBlock(42, 48, stride=2),
            TorchBlazeBlock(48, 56), TorchBlazeBlock(56, 64),
            TorchBlazeBlock(64, 72), TorchBlazeBlock(72, 80),
            TorchBlazeBlock(80, 88),
        )
        self.backbone2 = nn.Sequential(
            TorchBlazeBlock(88, 96, stride=2), TorchBlazeBlock(96, 96),
            TorchBlazeBlock(96, 96), TorchBlazeBlock(96, 96),
            TorchBlazeBlock(96, 96),
        )
        self.classifier_8 = nn.Conv2d(88, 2, 1)
        self.classifier_16 = nn.Conv2d(96, 6, 1)
        self.regressor_8 = nn.Conv2d(88, 32, 1)
        self.regressor_16 = nn.Conv2d(96, 96, 1)

    def forward(self, x):
        b = x.shape[0]
        x = F.pad(x, (1, 2, 1, 2))
        x = self.backbone1(x)
        h = self.backbone2(x)
        c1 = self.classifier_8(x).permute(0, 2, 3, 1).reshape(b, -1, 1)
        c2 = self.classifier_16(h).permute(0, 2, 3, 1).reshape(b, -1, 1)
        r1 = self.regressor_8(x).permute(0, 2, 3, 1).reshape(b, -1, 16)
        r2 = self.regressor_16(h).permute(0, 2, 3, 1).reshape(b, -1, 16)
        return torch.cat((r1, r2), 1), torch.cat((c1, c2), 1)


def test_forward_parity_vs_torch_oracle():
    torch.manual_seed(0)
    net_t = TorchBlazeFace().eval()
    x = torch.randn(2, 3, 128, 128)
    with torch.no_grad():
        box_t, score_t = net_t(x)

    params = convert_state_dict(net_t.state_dict())
    net_j = BlazeFaceNet()
    box_j, score_j = net_j.apply(params, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))

    np.testing.assert_allclose(np.asarray(box_j), box_t.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(score_j), score_t.numpy(), atol=2e-4)


def test_anchor_layout():
    a = generate_anchors()
    assert a.shape == (896, 4)
    # fixed_anchor_size: every anchor is unit-sized
    assert np.all(a[:, 2:] == 1.0)
    # first 512 anchors on the 16x16 grid (2 per cell), rest on 8x8 (6 per cell)
    assert np.allclose(a[0, :2], [0.5 / 16, 0.5 / 16])
    assert np.allclose(a[1, :2], a[0, :2])  # same cell, 2 scales
    assert np.allclose(a[2, :2], [1.5 / 16, 0.5 / 16])
    assert np.allclose(a[512, :2], [0.5 / 8, 0.5 / 8])
    assert np.allclose(a[512:518, :2], np.tile([[0.5 / 8, 0.5 / 8]], (6, 1)))
    # row-major sweep: last anchor of each grid at the bottom-right cell
    assert np.allclose(a[511, :2], [15.5 / 16, 15.5 / 16])
    assert np.allclose(a[895, :2], [7.5 / 8, 7.5 / 8])


def test_decode_boxes_matches_reference_math():
    rng = np.random.default_rng(0)
    raw = rng.normal(0, 10, (1, 896, 16)).astype(np.float32)
    anchors = generate_anchors()
    out = decode_boxes(raw, anchors)
    cx = raw[0, :, 0] / 128.0 + anchors[:, 0]
    cy = raw[0, :, 1] / 128.0 + anchors[:, 1]
    w = raw[0, :, 2] / 128.0
    h = raw[0, :, 3] / 128.0
    np.testing.assert_allclose(out[0, :, 0], cy - h / 2, rtol=1e-6)
    np.testing.assert_allclose(out[0, :, 1], cx - w / 2, rtol=1e-6)
    np.testing.assert_allclose(out[0, :, 2], cy + h / 2, rtol=1e-6)
    np.testing.assert_allclose(out[0, :, 3], cx + w / 2, rtol=1e-6)
    np.testing.assert_allclose(out[0, :, 4], raw[0, :, 4] / 128.0 + anchors[:, 0],
                               rtol=1e-6)


def test_weighted_nms_blends_overlaps():
    # two heavily overlapping boxes + one distant box
    d = np.zeros((3, 17), np.float32)
    d[0, :4] = [0.1, 0.1, 0.3, 0.3]; d[0, 16] = 0.9
    d[1, :4] = [0.11, 0.11, 0.31, 0.31]; d[1, 16] = 0.6
    d[2, :4] = [0.7, 0.7, 0.9, 0.9]; d[2, 16] = 0.8
    out = weighted_nms(d)
    assert out.shape[0] == 2
    # first output = score-weighted blend of boxes 0 and 1
    expect = (d[0, :4] * 0.9 + d[1, :4] * 0.6) / 1.5
    np.testing.assert_allclose(out[0, :4], expect, rtol=1e-6)
    assert out[0, 16] == pytest.approx((0.9 + 0.6) / 2)
    np.testing.assert_allclose(out[1, :4], d[2, :4])


def test_resize_and_crop_shifts():
    img = np.zeros((200, 100, 3), np.uint8)  # tall
    crop, (xs, ys) = resize_and_crop_image(img)
    assert crop.shape == (128, 128, 3)
    assert (xs, ys) == (0, 50)
    img = np.zeros((100, 240, 3), np.uint8)  # wide
    crop, (xs, ys) = resize_and_crop_image(img)
    assert crop.shape == (128, 128, 3)
    assert (xs, ys) == (70, 0)


def test_detector_end_to_end_random_weights():
    det = BlazeFaceDetector.init_random(min_score_thresh=0.0)
    imgs = (np.random.default_rng(0).uniform(0, 255, (2, 160, 160, 3))
            .astype(np.uint8))
    out = det.detect(imgs)
    assert len(out) == 2
    for faces in out:
        assert faces.ndim == 2 and faces.shape[1] == 5
