"""The predictor-precision knob: resolution order, context application,
and that the registry's feature_fns trace under it (reference runs its
frozen predictors/Inception in f32; TPU convs default to bf16 multiplies)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gan_control_tpu.utils.precision import (
    ENV_VAR,
    predictor_precision,
    predictor_precision_ctx,
    with_predictor_precision,
)


def test_resolution_order(monkeypatch):
    monkeypatch.delenv(ENV_VAR, raising=False)
    assert predictor_precision() == "highest"                  # eval default
    # the in-training battery passes fallback='default' (memory-bound)
    assert predictor_precision(fallback="default") == "default"
    assert predictor_precision("default") == "default"         # config
    assert predictor_precision("highest", fallback="default") == "highest"
    assert predictor_precision("float32") == "highest"         # alias
    monkeypatch.setenv(ENV_VAR, "tensorfloat32")
    assert predictor_precision("default") == "tensorfloat32"   # env wins
    assert predictor_precision(fallback="default") == "tensorfloat32"
    monkeypatch.setenv(ENV_VAR, "fp8")
    with pytest.raises(ValueError):
        predictor_precision()


def test_context_applies_precision(monkeypatch):
    monkeypatch.setenv(ENV_VAR, "tensorfloat32")
    seen = {}

    def probe():
        seen["inside"] = jax.config.jax_default_matmul_precision
        return 0

    before = jax.config.jax_default_matmul_precision
    with_predictor_precision(probe)()
    assert seen["inside"] == "tensorfloat32"
    assert jax.config.jax_default_matmul_precision == before  # restored


def test_registry_feature_fn_traces_under_knob(monkeypatch):
    """build_attr_losses feature_fns run inside the precision context —
    verified by tracing a probe predictor that records the active value."""
    from gan_control_tpu.losses import registry

    monkeypatch.setenv(ENV_VAR, "tensorfloat32")
    seen = {}

    class FakeMod:
        @staticmethod
        def make_model(cfg):
            return None

        @staticmethod
        def init_params(model, rng):
            return {}

        @staticmethod
        def features(model, params, images):
            seen["prec"] = jax.config.jax_default_matmul_precision
            return [jnp.mean(images, axis=(1, 2, 3), keepdims=True)]

        @staticmethod
        def last_layer_dist(feats):
            return jnp.zeros((feats.shape[0], feats.shape[0]))

    monkeypatch.setitem(registry.PREDICTOR_MODULES, "fake_loss", "fake")
    monkeypatch.setattr(registry, "_load_predictor", lambda name: FakeMod)

    tc = {
        "fake_loss": {
            "enabled": True,
            "same_group_name": "id",
            "intermediate_layers_weights": [],
            "last_layer_weight": 1.0,
            "lower_thres": [],
            "upper_thres": [],
            "last_lower_thres": 0.1,
            "last_upper_thres": 1.0,
            "focus_on_list": ["same_as_last_layer"],
        }
    }
    specs, params = registry.build_attr_losses(tc)
    (spec,) = specs
    imgs = jnp.zeros((2, 8, 8, 3))
    jax.jit(lambda p, x: spec.feature_fn(p, x))(params["fake_loss"], imgs)
    assert seen["prec"] == "tensorfloat32"


def test_calibrate_thresholds_precision_flag(monkeypatch, tmp_path):
    """--precision on the calibration CLI exports the env knob before jax
    work starts (the documented A/B drift workflow)."""
    import calibrate_thresholds as cli

    monkeypatch.delenv(ENV_VAR, raising=False)
    # invalid config path aborts after the env is set; that's all we need
    with pytest.raises(Exception):
        cli.main([
            "--config_path", str(tmp_path / "missing.json"),
            "--loss", "embedding_loss", "--precision", "default",
        ])
    import os

    assert os.environ[ENV_VAR] == "default"
