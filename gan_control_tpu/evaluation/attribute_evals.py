"""Per-attribute predictor wrappers used by evaluation, phase-2a extraction
and the Tracker (reference evaluation/orientation.py:37-42, expression.py
:43-48, age.py:18-23, hair.py:20-22, recon_3d.py).

Each takes (predictor_module, model, params, images in [-1,1] NHWC) and
returns host numpy of the human-interpretable value."""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp


def calc_orientation_from_tensor_images(hopenet, model, params, images) -> np.ndarray:
    """[B,3] (yaw, pitch, roll) degrees."""
    return np.asarray(hopenet.predict(model, params, jnp.asarray(images)))


def calc_age_from_tensor_images(dex, model, params, images) -> np.ndarray:
    """[B] expected age in years."""
    return np.asarray(dex.predict(model, params, jnp.asarray(images)))


def calc_expression_from_tensor_images(esr9, model, params, images) -> np.ndarray:
    """[B] ensemble-vote class index (8 classes)."""
    return np.asarray(esr9.predict(model, params, jnp.asarray(images)))


def calc_hair_color_from_images(hair, model, params, images) -> np.ndarray:
    """[B,3] mean hair RGB in [0,1]."""
    return np.asarray(hair.predict(model, params, jnp.asarray(images)))


def calc_recon3d_from_tensor_images(recon, model, params, images) -> dict[str, np.ndarray]:
    """All 3DMM coefficient groups (id/ex/tex/angles/gamma/xy/z)."""
    vec = recon.features(model, params, jnp.asarray(images))[-1]
    return {
        name: np.asarray(recon.extract_feature(vec, name))
        for name in ("id", "ex", "tex", "angles", "gamma", "xy", "z")
    }


def annotate_attribute_images(
    loss_name: str,
    images01: np.ndarray,
    preds: np.ndarray,
    extra_preds: np.ndarray | None = None,
) -> np.ndarray:
    """[N,H,W,C] images in [0,1] + predictor outputs -> annotated [0,1]
    images, matching the reference's per-cell matrix annotations
    (generator_trainer.py:792-850 via hopenet_utils.draw_axis /
    write text): orientation draws pose axes, age/expression/hair write
    the predicted value, 'attribute' (orientation+expression) combines
    axes with the expression class text."""
    from gan_control_tpu.utils.image_utils import (
        draw_axis_on_image,
        write_text_on_image,
    )

    images01 = np.asarray(images01)
    preds = np.asarray(preds)
    out = []
    for n, img in enumerate(images01):
        u8 = (np.clip(img, 0.0, 1.0) * 255.0).astype(np.uint8)
        if loss_name in ("orientation_loss", "attribute"):
            yaw, pitch, roll = (float(v) for v in preds[n][:3])
            u8 = draw_axis_on_image(u8, yaw, pitch, roll,
                                    size=min(u8.shape[:2]) / 4.0)
        if loss_name == "age_loss":
            u8 = write_text_on_image(u8, f"{float(preds[n]):.1f}y")
        elif loss_name == "expression_loss":
            from gan_control_tpu.losses.predictors.esr9 import EXPRESSION_CLASSES

            u8 = write_text_on_image(u8, EXPRESSION_CLASSES[int(preds[n])])
        elif loss_name == "hair_loss":
            r, g, b = (float(v) for v in preds[n][:3])
            u8 = write_text_on_image(u8, f"rgb {r:.2f} {g:.2f} {b:.2f}")
        elif loss_name == "attribute" and extra_preds is not None:
            from gan_control_tpu.losses.predictors.esr9 import EXPRESSION_CLASSES

            u8 = write_text_on_image(u8, EXPRESSION_CLASSES[int(extra_preds[n])])
        out.append(u8.astype(np.float32) / 255.0)
    return np.stack(out)
