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
