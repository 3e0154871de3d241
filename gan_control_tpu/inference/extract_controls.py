"""Extract control values from arbitrary images — the full predictor
battery of evaluation/inference_class.Inference.extract_controls_from_images
(reference :274-303): orientation (Hopenet), age (DEX), expression (ESR-9),
hair color (PSPNet), and the 3DMM-derived gamma/expression3d/orientation3d
(R-Net, optionally on 3D-aligned crops).

Used to recover the controls of a real photo so it can be re-applied to
generated identities via Controller.gen_batch_by_controls."""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np

from gan_control_tpu.losses.registry import PREDICTOR_MODULES, _load_predictor
from gan_control_tpu.utils.logging_utils import get_logger

_log = get_logger(__name__)

CONTROL_LOSSES = (
    "orientation_loss", "age_loss", "expression_loss", "hair_loss",
    "recon_3d_loss", "embedding_loss",
)


class ControlExtractor:
    def __init__(self, training_config: dict, align_fn=None, rng: jax.Array | None = None):
        """training_config: the phase-1 loss blocks (for model_path etc.);
        align_fn: optional 3D-alignment preprocessing for the R-Net path."""
        rng = jax.random.PRNGKey(0) if rng is None else rng
        self.align_fn = align_fn
        self.mods: dict[str, tuple[Any, Any, Any]] = {}
        for loss in CONTROL_LOSSES:
            block = training_config.get(loss)
            if not isinstance(block, dict) or not block.get("enabled"):
                continue
            pm = _load_predictor(PREDICTOR_MODULES[loss])
            model = pm.make_model(block)
            rng, k = jax.random.split(rng)
            mp = block.get("model_path", "")
            if mp and os.path.exists(mp) and hasattr(pm, "convert_torch_weights"):
                params = pm.convert_torch_weights(model, mp)
            else:
                _log.warning("%s: random weights (no checkpoint at %r)", loss, mp)
                params = pm.init_params(model, k)
            self.mods[loss] = (pm, model, params)

    def extract(self, images) -> dict[str, np.ndarray]:
        """images: [-1,1] NHWC. Returns control dict keyed like the
        attributes DataFrame columns."""
        import jax.numpy as jnp

        images = jnp.asarray(images)
        out: dict[str, np.ndarray] = {}
        if "orientation_loss" in self.mods:
            pm, m, p = self.mods["orientation_loss"]
            out["orientation"] = np.asarray(pm.predict(m, p, images))
        if "age_loss" in self.mods:
            pm, m, p = self.mods["age_loss"]
            out["age"] = np.asarray(pm.predict(m, p, images))
        if "expression_loss" in self.mods:
            pm, m, p = self.mods["expression_loss"]
            out["expression_q"] = np.asarray(pm.predict(m, p, images))
        if "hair_loss" in self.mods:
            pm, m, p = self.mods["hair_loss"]
            out["hair"] = np.asarray(pm.predict(m, p, images))
        recon_in = images if self.align_fn is None else self.align_fn(images)
        if "recon_3d_loss" in self.mods:
            pm, m, p = self.mods["recon_3d_loss"]
            vec = pm.features(m, p, recon_in)[-1]
            out["gamma3d"] = np.asarray(pm.extract_feature(vec, "gamma"))
            out["expression3d"] = np.asarray(pm.extract_feature(vec, "ex"))
            out["orientation3d"] = np.asarray(pm.extract_feature(vec, "angles"))
        if "embedding_loss" in self.mods:
            pm, m, p = self.mods["embedding_loss"]
            out["arcface_emb"] = np.asarray(pm.predict(m, p, recon_in))
        return out
