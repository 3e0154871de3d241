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

from gan_control_tpu.alignment.align_math import (
    POS,
    align_tensor_images,
    default_lm3d,
    make_68_to_5,
    preprocess_face,
)
from gan_control_tpu.alignment.fan import FAN, decode_heatmaps


def make_align_fn(fan_params=None, lm3d=None):
    """Returns images([-1,1] NHWC) -> aligned [-1,1] NHWC [B,224,224,3].

    With fan_params=None, uses the alignment-free fallback (bicubic resize),
    matching the reference's align_3d=False path."""
    import jax.numpy as jnp

    from gan_control_tpu.losses.predictors.common import resize_bicubic

    if fan_params is None:
        def fallback(images):
            return resize_bicubic(images, (224, 224), align_corners=False)

        return fallback

    import numpy as np

    lm3d = default_lm3d() if lm3d is None else lm3d
    fan = FAN()

    def align(images):
        lms = fan.get_landmarks(fan_params, images)  # [B, 68, 2] numpy
        return jnp.asarray(
            align_tensor_images(np.asarray(images), lms, lm3d)
        )

    return align
