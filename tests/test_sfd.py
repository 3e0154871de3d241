"""SFD detector structural tests (random weights): head shapes, decode
gold values, NMS behavior, end-to-end detect() contract."""

import numpy as np

import jax
import jax.numpy as jnp

from gan_control_tpu.alignment.sfd import (
    S3FD,
    SFDDetector,
    decode_boxes,
    nms,
)


def test_s3fd_head_shapes():
    m = S3FD()
    x = jnp.zeros((1, 128, 128, 3))
    p = m.init(jax.random.PRNGKey(0), x)
    heads = m.apply(p, x)
    assert len(heads) == 6
    # spatial sizes for 128 input (torch-parity): conv3_3/4_3/5_3 at strides
    # 4/8/16; fc6's 3x3 pad-3 conv grows the stride-32 map by 4 (the
    # reference does the same); conv6_2/7_2 halve from there
    expect = (32, 16, 8, 8, 4, 2)
    for i, (conf, loc) in enumerate(heads):
        assert conf.shape == (1, expect[i], expect[i], 2), (i, conf.shape)
        assert loc.shape == (1, expect[i], expect[i], 4)


def test_decode_identity_prior():
    prior = np.array([[50.0, 60.0, 32.0, 32.0]])
    loc = np.zeros((1, 4))
    box = decode_boxes(loc, prior)[0]
    np.testing.assert_allclose(box, [50 - 16, 60 - 16, 50 + 16, 60 + 16])


def test_nms_suppresses_overlaps():
    dets = np.array(
        [
            [0, 0, 10, 10, 0.9],
            [1, 1, 11, 11, 0.8],  # heavy overlap with first
            [50, 50, 60, 60, 0.7],
        ]
    )
    keep = nms(dets, 0.3)
    assert keep == [0, 2]


def test_detector_end_to_end_contract():
    det = SFDDetector.init_random()
    imgs = np.random.default_rng(0).integers(0, 255, (2, 64, 64, 3)).astype(np.uint8)
    out = det.detect(imgs)
    assert len(out) == 2
    for d in out:
        assert d.ndim == 2 and d.shape[1] == 5
