"""Face-alignment subsystem (the reference's vendored 1adrianb
face-alignment package + evaluation/face_alignment_utils).

Provides: FAN landmark network (flax) with heatmap decoding, the
Deep3DFaceRecon similarity-alignment math (68->5 landmarks, POS
least-squares, crop/resize), and ``align_tensor_images`` — the phase-2a
preprocessing step before the 3DMM R-Net.

Pretrained FAN weights are external downloads in the reference (api.py
:46-50); without them ``make_align_fn`` falls back to the reference's own
``align_3d=False`` behavior (plain bicubic 224 resize,
make_attributes_df.py:43-47)."""

import logging as _logging

from gan_control_tpu.alignment.align_math import (
    POS,
    align_tensor_images,
    default_lm3d,
    make_68_to_5,
    preprocess_face,
)
from gan_control_tpu.alignment.depth import DepthPredictor, ResNetDepth
from gan_control_tpu.alignment.fan import FAN, decode_heatmaps

_log = _logging.getLogger(__name__)


def make_detect_fn(detector: str, detector_params):
    """'sfd' | 'blazeface' -> images([-1,1] NHWC) -> per-image best box
    (x1,y1,x2,y2) or None when nothing passes the detector's threshold."""
    import numpy as np

    if detector == "sfd":
        from gan_control_tpu.alignment.sfd import SFDDetector

        det = SFDDetector(params=detector_params)
    elif detector == "blazeface":
        from gan_control_tpu.alignment.blazeface import BlazeFaceDetector

        det = BlazeFaceDetector(params=detector_params)
    else:
        raise ValueError(
            f"unknown detector {detector!r}: expected 'sfd' or 'blazeface'"
        )

    def detect(images) -> list:
        u8 = np.clip(
            (np.asarray(images) * 0.5 + 0.5) * 255.0, 0, 255
        ).astype(np.uint8)
        boxes = []
        for dets in det.detect(u8):
            if len(dets) == 0:
                boxes.append(None)
            else:  # highest-score box: the reference facade aligns every
                # detection, but phase-2a images contain exactly one face
                boxes.append(dets[np.argmax(dets[:, 4])][:4])
        return boxes

    return detect


def make_align_fn(fan_params=None, lm3d=None, detector=None,
                  detector_params=None, depth_params=None):
    """Returns images([-1,1] NHWC) -> aligned [-1,1] NHWC [B,224,224,3].

    The full reference pipeline (face-alignment/api.py:116-190 +
    inference_class.py 3D alignment): detector -> per-face center/scale
    crop -> FAN landmarks -> POS similarity warp. ``detector`` ('sfd' or
    'blazeface', with ``detector_params``) replaces the whole-image box
    assumption; ``depth_params`` adds the LandmarksType._3D z net (POS
    itself consumes only x,y — face_alignment_utils.py:74-96 — so depth
    is decoded but does not change the warp).

    With fan_params=None, uses the alignment-free fallback (bicubic
    resize), matching the reference's align_3d=False path — and WARNS,
    because callers asking for 3D alignment without FAN weights silently
    got unaligned crops in earlier revisions."""
    import jax.numpy as jnp

    from gan_control_tpu.losses.predictors.common import resize_bicubic

    if fan_params is None:
        if detector is not None or detector_params is not None \
                or depth_params is not None:
            # explicit detector/depth configuration without FAN weights is
            # a misconfiguration, not a fallback: silently discarding the
            # nets the caller loaded would build the DataFrame from
            # unaligned crops while the user believes alignment ran
            raise ValueError(
                "make_align_fn: detector/depth were configured but no FAN "
                "weights were given — the landmark stage is what consumes "
                "them. Pass fan_params (--fan_weights) or drop the "
                "detector/depth arguments."
            )
        _log.warning(
            "make_align_fn: no FAN weights given — falling back to the "
            "alignment-FREE bicubic 224 resize (the reference's "
            "align_3d=False path). 3D-aligned attribute columns "
            "(gamma3d/expression3d/...) will NOT go through landmarks; "
            "pass --fan_weights to enable real alignment."
        )

        def fallback(images):
            return resize_bicubic(images, (224, 224), align_corners=False)

        return fallback

    import numpy as np

    lm3d = default_lm3d() if lm3d is None else lm3d
    fan = FAN()
    detect = (
        make_detect_fn(detector, detector_params) if detector else None
    )
    depth = DepthPredictor() if depth_params is not None else None

    def align(images):
        boxes = None
        if detect is not None:
            ht, wd = images.shape[1], images.shape[2]
            boxes = [
                b if b is not None else np.array([0.0, 0.0, wd, ht])
                for b in detect(images)
            ]
        lms = fan.get_landmarks(
            fan_params, images, boxes=boxes, depth=depth,
            depth_params=depth_params,
        )  # [B, 68, 2|3] numpy
        return jnp.asarray(
            align_tensor_images(np.asarray(images), lms[..., :2], lm3d)
        )

    return align
