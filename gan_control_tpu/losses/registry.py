"""Loss registry: JSON training_config -> AttributeLossSpec list + params.

The TPU replacement for LossModelClass's skeleton/criterion factories
(reference losses/loss_model.py:40-102). Each predictor package under
``gan_control_tpu.losses.predictors`` exposes:

  - ``make_model(config) -> flax module`` (frozen feature extractor),
  - ``features(module, params, images) -> [layer1.., embedding]``
    including the reference's preprocessing quirks (center-crop, resize,
    BGR/x255 renorm),
  - ``last_layer_dist(features) -> [N,N]`` distance matrix,
  - ``predict(module, params, images) -> human values``,
  - ``controller_criterion(pred, target) -> scalar``,
  - ``init_params(module, rng)`` and optionally
    ``convert_torch_weights(path) -> params``.

If the configured ``model_path`` checkpoint exists, weights are converted
from the reference's torch format; otherwise parameters are randomly
initialized with a loud warning (training remains mechanically correct, but
the shipped contrastive thresholds are calibrated for pretrained weights).
"""

from __future__ import annotations

import importlib
import os
from typing import Any

import jax

from gan_control_tpu.losses.contrastive import (
    ContrastiveConfig,
    pairwise_hair_color,
    pairwise_l1,
    pairwise_mse_gram,
    pairwise_sq_l2,
)
from gan_control_tpu.training.train_step import AttributeLossSpec
from gan_control_tpu.utils.logging_utils import get_logger
from gan_control_tpu.utils.precision import predictor_precision_ctx
from gan_control_tpu.utils.weights import load_pretrained

_log = get_logger(__name__)

# loss block name -> predictor module under .predictors
PREDICTOR_MODULES = {
    "embedding_loss": "arcface",
    "orientation_loss": "hopenet",
    "age_loss": "dex_age",
    "expression_loss": "esr9",
    "hair_loss": "hair_pspnet",
    "recon_3d_loss": "face3dmm",
    "style_loss": "vgg_style",
    "dog_id_loss": "dogfacenet",
    "classification_loss": "imagenet_cls",
}

RECON_SUB_LOSSES = ("id", "ex", "tex", "angles", "gamma", "xy", "z")

# cross-set distance per loss (the criterion's (signatures, queries) form,
# used by separability evaluation — loss_model.calc_distances_list)
PAIRWISE_DIST = {
    "embedding_loss": pairwise_sq_l2,
    "dog_id_loss": pairwise_sq_l2,
    "orientation_loss": pairwise_l1,
    "age_loss": pairwise_l1,
    "expression_loss": pairwise_l1,
    "recon_3d_loss": pairwise_l1,
    "classification_loss": pairwise_l1,
    "style_loss": pairwise_mse_gram,
    "hair_loss": pairwise_hair_color,
}


def _load_predictor(name: str):
    return importlib.import_module(f"gan_control_tpu.losses.predictors.{name}")


def cast_predictor_params(params: Any, dtype) -> Any:
    """Cast every floating leaf of the frozen battery's param trees.

    Under the bf16 battery plan (``training_config.predictor_dtype=
    'bfloat16'``) every predictor op already casts its weights to the
    activation dtype at the use site (predictors/common.py — ``w.astype(
    x.dtype)``), so with bf16 images the weights are rounded to bf16 per-op
    anyway; storing them in bf16 makes the SAME rounding happen once at
    load while halving the battery's parameter read bytes in the HBM-bound
    g_step (TRAINING.md roofline). The one numerics delta is intermediates
    computed in the *param* dtype before the cast (batch-norm's folded
    scale/offset) — covered by the measured drift legs in WEIGHTS.md
    (tools/precision_drift.py --storage). Eval paths that feed f32 images
    still work off the same tree: bf16→f32 weight upcasts are exact.
    """
    import jax.numpy as jnp

    if str(dtype) == "int8":
        # int8 STORAGE experiment (TRAINING.md "battery storage dtype"):
        # per-tensor symmetric quantization; dequantized to the compute
        # dtype inside the jitted step (train_step._attr_losses_for_batch)
        return _map_shared_trees(params, _quantize_tree_int8)
    dtype = jnp.dtype(dtype)
    if dtype == jnp.float32:
        return params

    def cast_tree(tree):
        return jax.tree_util.tree_map(
            lambda x: x.astype(dtype)
            if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
            else x,
            tree,
        )

    return _map_shared_trees(params, cast_tree)


def _map_shared_trees(params, fn):
    """Apply ``fn`` per distinct tree, preserving aliasing: the recon-3d
    sub-losses all point at ONE shared R-Net tree (build_attr_losses:
    ``params[sub_name] = p``) — transforming each distinct tree once keeps
    that, or the transform would materialize seven R-Net copies on
    device."""
    if not isinstance(params, dict):
        return fn(params)
    memo: dict[int, Any] = {}
    out = {}
    for name, tree in params.items():
        if id(tree) not in memo:
            memo[id(tree)] = fn(tree)
        out[name] = memo[id(tree)]
    return out


def _quantize_tree_int8(tree):
    import jax.numpy as jnp
    import numpy as np

    def q(x):
        if not (hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)):
            return x
        arr = np.asarray(x, np.float32)
        scale = float(np.max(np.abs(arr)) / 127.0) or 1.0
        return {"q": jnp.asarray(np.round(arr / scale).astype(np.int8)),
                "s": jnp.float32(scale)}

    return jax.tree_util.tree_map(q, tree)


def dequantize_predictor_params(params, dtype):
    """Inverse of the int8 storage quantization: {"q","s"} leaf dicts ->
    ``dtype`` arrays; any other leaf passes through unchanged. Runs INSIDE
    the jitted step so HBM holds int8 (+8 scale bytes) per tensor."""
    import jax.numpy as jnp

    def is_q(x):
        return isinstance(x, dict) and set(x.keys()) == {"q", "s"}

    def deq(x):
        if is_q(x):
            return (x["q"].astype(jnp.float32) * x["s"]).astype(dtype)
        return x

    return jax.tree_util.tree_map(deq, params, is_leaf=is_q)


def build_attr_losses(
    training_config: dict, rng: jax.Array | None = None
) -> tuple[tuple[AttributeLossSpec, ...], dict[str, Any]]:
    """Instantiate every enabled loss. Returns (specs, predictor_params)."""
    rng = jax.random.PRNGKey(0) if rng is None else rng
    specs: list[AttributeLossSpec] = []
    params: dict[str, Any] = {}
    # IN-TRAINING battery precision. fallback='default' (single-pass bf16
    # multiplies): the f32-accumulation battery at 512²/batch 16 exhausts a
    # 16GB v5e next to the G/D graphs (measured). The eval/measurement
    # paths (FID, calibrate_thresholds, ControlExtractor) default to f32 —
    # see utils/precision.py and the drift table in WEIGHTS.md
    prec_cfg = training_config.get("predictor_precision")

    for loss_name, mod_name in PREDICTOR_MODULES.items():
        block = training_config.get(loss_name)
        if not isinstance(block, dict) or not block.get("enabled"):
            continue
        mod = _load_predictor(mod_name)
        model = mod.make_model(block)
        rng, k = jax.random.split(rng)
        model_path = block.get("model_path", "")
        convert_fn = (
            (lambda path, mod=mod, model=model: mod.convert_torch_weights(model, path))
            if hasattr(mod, "convert_torch_weights")
            else None
        )
        p = load_pretrained(model_path, convert_fn)
        if p is not None:
            _log.info("%s: loaded pretrained weights from %s", loss_name, model_path)
        else:
            _log.warning(
                "%s: pretrained weights not found at %r — using RANDOM weights "
                "(loss thresholds are calibrated for pretrained predictors)",
                loss_name, model_path,
            )
            # jit the init: flax init otherwise dispatches thousands of tiny
            # ops (minutes over a remote-TPU tunnel)
            p = jax.jit(lambda key, _m=mod, _mm=model: _m.init_params(_mm, key))(k)
        params[loss_name] = p

        if loss_name == "recon_3d_loss":
            # one shared skeleton forward; per-sub-feature contrastive heads
            # (reference generator_trainer.py:473-517). The shared forward
            # runs ONCE per g_step (train_step's share_key machinery) — the
            # sub-losses slice its [B,257] vector; feature_fn stays as the
            # standalone per-loss path (separability eval).
            def shared_recon_forward(pp, images, m=model, fmod=mod):
                with predictor_precision_ctx(prec_cfg, fallback="default"):
                    return fmod.features(m, pp, images)[-1]

            for sub in RECON_SUB_LOSSES:
                sub_block = block.get(f"{sub}_loss")
                if not isinstance(sub_block, dict) or not sub_block.get("enabled"):
                    continue
                sub_name = f"recon_{sub}_loss"
                params[sub_name] = p

                def make_feature_fn(m=model, fmod=mod, which=sub):
                    def feature_fn(pp, images):
                        with predictor_precision_ctx(prec_cfg, fallback="default"):
                            vec = fmod.features(m, pp, images)[-1]
                            return [fmod.extract_feature(vec, which)]
                    return feature_fn

                specs.append(
                    AttributeLossSpec(
                        name=sub_name,
                        group=sub_block["same_group_name"],
                        cfg=ContrastiveConfig.from_json(sub_block),
                        feature_fn=make_feature_fn(),
                        dist_fn=mod.last_layer_dist,
                        pair_dist_fn=pairwise_l1,
                        share_key="recon_3d_loss",
                        shared_forward_fn=shared_recon_forward,
                        extract_fn=(lambda vec, fmod=mod, which=sub:
                                    [fmod.extract_feature(vec, which)]),
                    )
                )
            continue

        def make_feature_fn(m=model, fmod=mod):
            def feature_fn(pp, images):
                with predictor_precision_ctx(prec_cfg, fallback="default"):
                    return fmod.features(m, pp, images)
            return feature_fn

        specs.append(
            AttributeLossSpec(
                name=loss_name,
                group=block["same_group_name"],
                cfg=ContrastiveConfig.from_json(block),
                feature_fn=make_feature_fn(),
                dist_fn=mod.last_layer_dist,
                pair_dist_fn=PAIRWISE_DIST.get(loss_name, pairwise_sq_l2),
            )
        )

    return tuple(specs), params
