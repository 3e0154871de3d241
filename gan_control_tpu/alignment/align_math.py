"""Deep3DFaceRecon similarity alignment math — host-side numpy/PIL.

Behavior contract (reference
evaluation/face_alignment_utils/face_alignment_utils.py):
  - make_68_to_5 (:14-20): 68 landmarks -> [left-eye, right-eye, nose,
    mouth-left, mouth-right] via the fixed index set.
  - POS (:34-56): least-squares similarity (scale + 2-D translation) from
    5 image landmarks to the 5-point 3-D face template.
  - process_img / Preprocess (:59-96): rescale so the face spans the
    canonical 102-pixel scale, crop 224x224 centered on the estimated
    translation.
  - align_tensor_images (:136-145): batch wrapper for generator output.

The 3-D template: the reference loads similarity_Lm3D_all.mat from the
Deep3DFaceReconstruction repo (an external download, load_lm3d :23-30);
``default_lm3d`` provides the standard BFM 5-point template values so the
pipeline runs without the .mat file (pass a loaded template for exact
parity)."""

from __future__ import annotations

import numpy as np


def default_lm3d() -> np.ndarray:
    """Standard BFM 5-point template (eye-L, eye-R, nose, mouth-L, mouth-R),
    X-Y-Z in the canonical face frame — numerically the well-known
    Deep3DFaceRecon values."""
    return np.array(
        [
            [-0.31148657, 0.09036078, 0.13377953],
            [0.30979887, 0.08972035, 0.13179526],
            [0.0032535, -0.24617933, 0.55244243],
            [-0.25216928, -0.5813392, 0.22405732],
            [0.2484662, -0.5812824, 0.22235769],
        ],
        dtype=np.float64,
    )


def make_68_to_5(lm68: np.ndarray) -> np.ndarray:
    """68x2(or 3) -> 5-point set in the reference's order (:14-20)."""
    idx = np.array([31, 37, 40, 43, 46, 49, 55]) - 1
    lm5 = np.stack(
        [
            lm68[idx[0]],
            lm68[idx[[1, 2]]].mean(axis=0),
            lm68[idx[[3, 4]]].mean(axis=0),
            lm68[idx[5]],
            lm68[idx[6]],
        ],
        axis=0,
    )
    return lm5[[1, 2, 0, 3, 4]]


def POS(xp: np.ndarray, x: np.ndarray):
    """Least-squares similarity: xp [2,N] image points, x [3,N] template.
    Returns (t [2,1], s)."""
    npts = xp.shape[1]
    a = np.zeros([2 * npts, 8])
    a[0 : 2 * npts - 1 : 2, 0:3] = x.T
    a[0 : 2 * npts - 1 : 2, 3] = 1
    a[1 : 2 * npts : 2, 4:7] = x.T
    a[1 : 2 * npts : 2, 7] = 1
    b = np.reshape(xp.T, [2 * npts, 1])
    k, _, _, _ = np.linalg.lstsq(a, b, rcond=None)
    r1, r2 = k[0:3], k[4:7]
    s = (np.linalg.norm(r1) + np.linalg.norm(r2)) / 2
    t = np.stack([k[3], k[7]], axis=0)
    return t, s


def _process_img(img_hwc: np.ndarray, t, s, target_size: int = 224) -> np.ndarray:
    """Rescale + crop (reference process_img :59-77). img in [0,255] uint8."""
    from PIL import Image

    pil = Image.fromarray(img_hwc)
    w0, h0 = pil.size
    w = int(w0 / s * 102)
    h = int(h0 / s * 102)
    pil = pil.resize((w, h), resample=Image.BICUBIC)
    left = int(w / 2 - target_size / 2 + float((t[0] - w0 / 2) * 102 / s))
    up = int(h / 2 - target_size / 2 + float((h0 / 2 - t[1]) * 102 / s))
    pil = pil.crop((left, up, left + target_size, up + target_size))
    return np.asarray(pil)


def preprocess_face(
    img_hwc_u8: np.ndarray, lm5: np.ndarray, lm3d: np.ndarray, crop_size: int = 224
) -> np.ndarray:
    """One face: uint8 HWC + 5 landmarks -> aligned uint8 [224,224,3]
    (reference Preprocess :80-96)."""
    h0 = img_hwc_u8.shape[0]
    lm = np.stack([lm5[:, 0], h0 - 1 - lm5[:, 1]], axis=1)  # flip y to X-Y plane
    t, s = POS(lm.T, lm3d[:, :3].T)
    return _process_img(img_hwc_u8, t, s, target_size=crop_size)


def align_tensor_images(
    images: np.ndarray, landmarks68: np.ndarray, lm3d: np.ndarray | None = None,
    crop_size: int = 224,
) -> np.ndarray:
    """[-1,1] NHWC batch + per-image 68 landmarks -> aligned [-1,1] NHWC
    [B,crop,crop,3] (reference align_tensor_images :136-145)."""
    lm3d = default_lm3d() if lm3d is None else lm3d
    out = []
    for img, lm68 in zip(images, landmarks68):
        u8 = (np.clip(img * 0.5 + 0.5, 0, 1) * 255).astype(np.uint8)
        aligned = preprocess_face(u8, make_68_to_5(np.asarray(lm68)), lm3d, crop_size)
        out.append(aligned.astype(np.float32) / 127.5 - 1.0)
    return np.stack(out)
