"""Precision control for the numerically-sensitive frozen-net paths.

TPU convs/matmuls default to one-pass bf16 multiplies (~1e-2 relative
error vs a float64 oracle for f32 inputs — measured in
ops/pallas_kernels.py:31-35), while the torch reference runs its frozen
predictors and InceptionV3 in true f32 (reference losses/loss_model.py
builds eval-mode f32 torch modules; fid_utils uses the f32 torchvision
InceptionV3). Two consumers are sensitive to that distance scale: the
contrastive criterion compares predictor feature distances against
CALIBRATED lower/upper thresholds, and FID feeds a covariance estimate.

``GANCTL_PREDICTOR_PRECISION`` (env; or ``predictor_precision`` in
training_config) selects the conv/matmul precision for those paths ONLY —
G/D keep the fast single-pass MXU default:

  - ``highest``       true-f32 accumulation (6-pass bf16) — reference
                      parity; default for the MEASUREMENT paths (FID
                      Inception features, ControlExtractor, annotation)
  - ``tensorfloat32`` 3-pass bf16 middle ground
  - ``default``       single-pass bf16 (fastest) — default for the
                      IN-TRAINING battery and threshold calibration (the
                      f32-accum battery OOMs a 16GB v5e at 512²/batch 16
                      next to the G/D graphs; calibration matches the
                      training mode so thresholds match training-time
                      distances)

The knob is applied at trace time via ``jax.default_matmul_precision``;
JAX includes it in the jit cache key, so flipping the env var between runs
recompiles rather than silently reusing stale kernels. Measured
threshold-scale drift between modes on the real v5e is recorded in
WEIGHTS.md (calibrate_thresholds --precision A/B)."""

from __future__ import annotations

import functools
import os
from typing import Callable

import jax

ENV_VAR = "GANCTL_PREDICTOR_PRECISION"
VALID = ("default", "tensorfloat32", "highest")


def predictor_precision(
    config_value: str | None = None, fallback: str = "highest"
) -> str:
    """Resolve the predictor precision: env var > config > `fallback`.

    fallback='highest' is the eval-path default (FID features, threshold
    calibration, ControlExtractor, annotation forwards). The IN-TRAINING
    contrastive battery passes fallback='default': running all six
    predictors at f32 accumulation alongside the G/D graphs exhausts a
    16GB v5e at 512²/batch 16 (measured — two concurrently-dispatched
    step workspaces stop fitting), so the hot path keeps the single-pass
    MXU mode and the thresholds are validated/re-derived against it via
    calibrate_thresholds (whose measurement itself runs f32)."""
    p = os.environ.get(ENV_VAR) or config_value or fallback
    if p == "float32":  # common alias
        p = "highest"
    if p not in VALID:
        raise ValueError(
            f"{ENV_VAR}={p!r}: expected one of {VALID} (or 'float32')"
        )
    return p


def predictor_precision_ctx(
    config_value: str | None = None, fallback: str = "highest"
):
    """Context manager applying the configured precision to ops traced
    within (usable both around a jitted call and inside traced code)."""
    return jax.default_matmul_precision(
        predictor_precision(config_value, fallback)
    )


def with_predictor_precision(
    fn: Callable, config_value: str | None = None, fallback: str = "highest"
) -> Callable:
    """Wrap fn so its convs/matmuls trace at the configured precision."""

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with predictor_precision_ctx(config_value, fallback):
            return fn(*args, **kwargs)

    return wrapped
