"""Alignment-math tests: POS similarity recovery, 68->5 reduction, aligned
output shape; FAN heatmap decoding; SH basis gold values."""

import numpy as np
import pytest

from gan_control_tpu.alignment.align_math import (
    POS,
    align_tensor_images,
    default_lm3d,
    make_68_to_5,
)
from gan_control_tpu.alignment.fan import decode_heatmaps
from gan_control_tpu.utils.spherical_harmonics import (
    gamma_from_direction,
    sh_eval_basis_1,
)


def test_pos_recovers_similarity():
    """Project the template with a known scale+translation; POS must
    recover them."""
    lm3d = default_lm3d()
    s_true, tx, ty = 80.0, 100.0, 120.0
    xp = np.stack([lm3d[:, 0] * s_true + tx, lm3d[:, 1] * s_true + ty], axis=0)
    t, s = POS(xp, lm3d.T)
    np.testing.assert_allclose(float(s), s_true, rtol=1e-6)
    np.testing.assert_allclose(t.ravel(), [tx, ty], rtol=1e-6)


def test_make_68_to_5_order():
    lm68 = np.arange(68 * 2, dtype=np.float64).reshape(68, 2)
    lm5 = make_68_to_5(lm68)
    assert lm5.shape == (5, 2)
    # output order: eyeL(mean 37,40), eyeR(mean 43,46), nose(31), mouth 49, 55
    np.testing.assert_allclose(lm5[2], lm68[30])
    np.testing.assert_allclose(lm5[0], (lm68[36] + lm68[39]) / 2)
    np.testing.assert_allclose(lm5[3], lm68[48])


def test_align_tensor_images_shape():
    rng = np.random.default_rng(0)
    images = rng.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32)
    # synthetic landmarks roughly at canonical face positions
    lm68 = np.tile(np.linspace(10, 54, 68)[:, None], (1, 2))[None].repeat(2, axis=0)
    out = align_tensor_images(images, lm68)
    assert out.shape == (2, 224, 224, 3)
    assert out.min() >= -1.001 and out.max() <= 1.001


def test_decode_heatmaps_peak():
    hm = np.zeros((1, 64, 64, 2), np.float32)
    hm[0, 10, 20, 0] = 1.0
    hm[0, 10, 21, 0] = 0.5  # neighbor pulls +x
    hm[0, 40, 30, 1] = 1.0
    coords = decode_heatmaps(hm)
    # x: right neighbor stronger -> +0.25; y: both neighbors zero -> no shift
    np.testing.assert_allclose(coords[0, 0], [20 + 0.25 + 0.5, 10 + 0.5])
    np.testing.assert_allclose(coords[0, 1], [30 + 0.5, 40 + 0.5])


def test_sh_basis_gold():
    b = sh_eval_basis_1(0.0, 0.0, 1.0)
    assert b.shape == (27,)
    np.testing.assert_allclose(b[0::9], 0.282094791773878140)
    np.testing.assert_allclose(b[2::9], 0.488602511902919920)
    np.testing.assert_allclose(b[1::9], 0.0)
    g = gamma_from_direction(2.0, 0.0, 0.0)  # normalizes internally
    np.testing.assert_allclose(g[3::9], -0.488602511902919920)


def test_folder_detector(tmp_path):
    """Pre-computed-box 'detector' (reference detection/folder): reads
    <image>.npy sidecars, validates shape, raises when absent."""
    from gan_control_tpu.alignment.folder import FolderDetector

    img = tmp_path / "face_001.png"
    img.write_bytes(b"")
    boxes = np.array([[10.0, 20.0, 110.0, 140.0, 0.99]], np.float32)
    np.save(tmp_path / "face_001.npy", boxes)

    det = FolderDetector()
    got = det.detect_from_path(img)
    np.testing.assert_allclose(got, boxes)

    (out,) = det.detect([None], [img])
    np.testing.assert_allclose(out, boxes)

    # a faceless image's sidecar (zero rows) is legitimate: empty (0,5) out
    np.save(tmp_path / "face_001.npy", np.zeros((0, 5), np.float32))
    empty = det.detect_from_path(img)
    assert empty.shape == (0, 5)

    import pytest as _pytest
    with _pytest.raises(FileNotFoundError):
        det.detect_from_path(tmp_path / "missing.png")

    # one flat (x1,y1,x2,y2) vector — the natural single-box save — is a
    # single row, not a (4,1) shape error
    flat = tmp_path / "face_002.png"
    flat.write_bytes(b"")
    np.save(tmp_path / "face_002.npy", np.array([10.0, 20.0, 110.0, 140.0]))
    got = det.detect_from_path(flat)
    np.testing.assert_allclose(got, [[10.0, 20.0, 110.0, 140.0]])

    # image PATHS double as the sidecar keys (detect(images) surface)
    (out,) = det.detect([str(flat)])
    np.testing.assert_allclose(out, [[10.0, 20.0, 110.0, 140.0]])
    with _pytest.raises(ValueError):
        det.detect([np.zeros((4, 4, 3))])  # decoded images need paths=

    # Lua-Torch .t7 sidecars are not torch.load-able: loud instruction
    t7 = tmp_path / "face_003.png"
    t7.write_bytes(b"")
    (tmp_path / "face_003.t7").write_bytes(b"\x04")
    with _pytest.raises(ValueError, match="Lua-Torch"):
        det.detect_from_path(t7)
