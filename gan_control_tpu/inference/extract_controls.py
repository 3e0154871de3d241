"""Extract control values from arbitrary images — the full predictor
battery of evaluation/inference_class.Inference.extract_controls_from_images
(reference :274-303): orientation (Hopenet), age (DEX), expression (ESR-9),
hair color (PSPNet), and the 3DMM-derived gamma/expression3d/orientation3d
(R-Net, optionally on 3D-aligned crops).

This is THE predictor-battery codepath: make_attributes_df.py (phase 2a)
builds its DataFrame columns through it, and it recovers the controls of a
real photo so they can be re-applied to generated identities via
Controller.gen_batch_by_controls."""

from __future__ import annotations

import os
from typing import Any, Callable

import jax
import numpy as np

from gan_control_tpu.losses.registry import PREDICTOR_MODULES, _load_predictor
from gan_control_tpu.utils.logging_utils import get_logger

_log = get_logger(__name__)

CONTROL_LOSSES = (
    "orientation_loss", "age_loss", "expression_loss", "hair_loss",
    "recon_3d_loss", "embedding_loss",
)

# loss block -> DataFrame column for the scalar/vector predictors
_SIMPLE_COLUMNS = {
    "orientation_loss": "orientation",
    "age_loss": "age",
    "expression_loss": "expression_q",
    "hair_loss": "hair",
    "embedding_loss": "arcface_emb",
}


class ControlExtractor:
    def __init__(self, training_config: dict, align_fn=None,
                 rng: jax.Array | None = None, align_3d: bool = False):
        """training_config: the phase-1 loss blocks (for model_path etc.);
        align_fn: optional 3D-alignment preprocessing applied before the
        R-Net / ArcFace path; align_3d: inputs to the R-Net AND the ArcFace
        id embedding are already aligned crops, so both configs' center_crop
        is disabled (reference make_attributes_df.py:34-36 clears it for
        recon_3d AND id_embedding; align_3d=False keeps the crops, :43-47)."""
        rng = jax.random.PRNGKey(0) if rng is None else rng
        self.align_fn = align_fn
        self.mods: dict[str, tuple[Any, Any, Any]] = {}
        # jitted per-predictor forwards: unjitted flax apply dispatches
        # thousands of tiny ops (catastrophic over a remote-TPU link).
        # params are a traced ARGUMENT, not a closure constant — a
        # closed-over 500MB weight tree gets serialized into the compile
        # request (HTTP 413 over a remote-compile link)
        self._fns: dict[str, Callable] = {}
        for loss in CONTROL_LOSSES:
            block = training_config.get(loss)
            if not isinstance(block, dict) or not block.get("enabled"):
                continue
            pm = _load_predictor(PREDICTOR_MODULES[loss])
            if loss in ("recon_3d_loss", "embedding_loss") and align_3d:
                block = dict(block, center_crop=None)
            model = pm.make_model(block)
            rng, k = jax.random.split(rng)
            mp = block.get("model_path", "")
            if mp and os.path.exists(mp) and hasattr(pm, "convert_torch_weights"):
                params = pm.convert_torch_weights(model, mp)
            else:
                _log.warning("%s: random weights (no checkpoint at %r)", loss, mp)
                params = jax.jit(
                    lambda key, _pm=pm, _m=model: _pm.init_params(_m, key)
                )(k)
            self.mods[loss] = (pm, model, params)
            from gan_control_tpu.utils.precision import with_predictor_precision

            if loss == "recon_3d_loss":
                raw = jax.jit(with_predictor_precision(
                    lambda p, imgs, _pm=pm, _m=model: _pm.features(_m, p, imgs)[-1]
                ))
            else:
                raw = jax.jit(with_predictor_precision(
                    lambda p, imgs, _pm=pm, _m=model: _pm.predict(_m, p, imgs)
                ))
            self._fns[loss] = lambda imgs, _raw=raw, _p=params: _raw(_p, imgs)

    def extract(self, images) -> dict[str, np.ndarray]:
        """images: [-1,1] NHWC. Returns control dict keyed like the
        attributes DataFrame columns."""
        import jax.numpy as jnp

        images = jnp.asarray(images)
        recon_in = images if self.align_fn is None else self.align_fn(images)
        out: dict[str, np.ndarray] = {}
        for loss, col in _SIMPLE_COLUMNS.items():
            if loss not in self._fns:
                continue
            x = recon_in if loss == "embedding_loss" else images
            out[col] = np.asarray(self._fns[loss](x))
        if "recon_3d_loss" in self._fns:
            pm = self.mods["recon_3d_loss"][0]
            vec = self._fns["recon_3d_loss"](recon_in)
            out["gamma3d"] = np.asarray(pm.extract_feature(vec, "gamma"))
            out["expression3d"] = np.asarray(pm.extract_feature(vec, "ex"))
            out["orientation3d"] = np.asarray(pm.extract_feature(vec, "angles"))
        return out
