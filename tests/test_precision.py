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


# --- battery storage dtype (predictor_dtype knob) -------------------------

PREDICTOR_DTYPE_CASES = [
    ("arcface", {"center_crop": None}, 64),
    ("hopenet", {}, 64),
    ("dex_age", {"center_crop": None}, 64),
    ("esr9", {"center_crop": None}, 96),
    ("face3dmm", {"center_crop": None}, 64),
    ("hair_pspnet", {}, 64),
    ("vgg_style", {"resize_to": 64, "center_crop": None}, 64),
    ("dogfacenet", {"center_crop": None}, 64),
    ("imagenet_cls", {"center_crop": None}, 64),
]


@pytest.mark.parametrize("mod_name,config,img_size", PREDICTOR_DTYPE_CASES)
def test_backbone_runs_at_caller_dtype(mod_name, config, img_size):
    """bf16 images -> every returned feature is bf16: the backbone really ran
    at the caller's dtype (the preprocessing f32 constants did not silently
    upcast the whole net — the cast at apply entry re-asserts it). The f32
    default path is covered by test_predictors.py."""
    import importlib

    mod = importlib.import_module(
        f"gan_control_tpu.losses.predictors.{mod_name}"
    )
    model = mod.make_model(config)
    params = mod.init_params(model, jax.random.PRNGKey(0))
    images = (
        jax.random.normal(jax.random.PRNGKey(1), (2, img_size, img_size, 3))
        * 0.3
    ).astype(jnp.bfloat16)
    feats = jax.jit(lambda p, x: mod.features(model, p, x))(params, images)
    for f in feats:
        assert f.dtype == jnp.bfloat16, (mod_name, f.shape, f.dtype)
        assert np.all(np.isfinite(np.asarray(f, np.float32)))


def test_train_step_predictor_dtype_bf16():
    """predictor_dtype='bfloat16' hands the battery bf16 images while the
    contrastive loss math stays f32 (thresholds calibrated on f32 distances)."""
    from gan_control_tpu.latent.groups import GroupSpec, LatentGroup
    from gan_control_tpu.losses.contrastive import (
        ContrastiveConfig,
        pairwise_sq_l2,
    )
    from gan_control_tpu.models.discriminator import Discriminator
    from gan_control_tpu.models.generator import Generator
    from gan_control_tpu.training.state import (
        init_gan_state,
        make_gan_optimizers,
    )
    from gan_control_tpu.training.train_step import (
        AttributeLossSpec,
        TrainStepConfig,
        make_train_steps,
    )

    size, batch, style = 16, 8, 64
    spec = GroupSpec(
        groups=(
            LatentGroup("id", 0, 32, mb_start=0, mb_end=4, count_range=(2, 6)),
            LatentGroup("other", 32, 64, mb_start=4, mb_end=8,
                        count_range=(2, 6)),
        ),
        mini_batch=batch,
        style_dim=style,
    )
    gen = Generator(size=size, style_dim=style, n_mlp=2, split_fc=True,
                    fc_groups=spec.fc_dims(), max_channels=32)
    disc = Discriminator(size=size, max_channels=32)
    g_tx, d_tx = make_gan_optimizers(
        {"lr_g": 2e-3, "lr_d": 2e-3, "g_reg_every": 4, "d_reg_every": 16}
    )

    seen = {}

    def spy_features(params, images):
        del params
        seen["dtype"] = images.dtype
        emb = jnp.mean(images, axis=(1, 2))
        return [emb]

    attr = (
        AttributeLossSpec(
            name="embedding_loss",
            group="id",
            cfg=ContrastiveConfig(
                intermediate_weights=(), last_layer_weight=1.0,
                lower_thres=(), upper_thres=(),
                last_lower_thres=0.1, last_upper_thres=1.0,
                focus_on=("same_as_last_layer",),
            ),
            feature_fn=spy_features,
            dist_fn=pairwise_sq_l2,
        ),
    )
    cfg = TrainStepConfig(batch=batch, mini_batch=batch, style_dim=style,
                          predictor_dtype="bfloat16")
    steps = make_train_steps(gen, disc, cfg, spec=spec, attr_losses=attr,
                             g_tx=g_tx, d_tx=d_tx)
    state = init_gan_state(gen, disc, g_tx, d_tx, jax.random.PRNGKey(0),
                           style_dim=style)
    z = jax.random.normal(jax.random.PRNGKey(2), (batch, style))
    _, metrics = jax.jit(steps["g_step"])(state, (z,), {"embedding_loss": {}})
    assert seen["dtype"] == jnp.bfloat16
    # loss math is f32 regardless of the battery dtype
    assert metrics["g_embedding_loss"].dtype == jnp.float32
    assert np.isfinite(float(metrics["g_loss"]))


def test_cast_predictor_params_bf16_preserves_aliasing():
    """cast_predictor_params casts float leaves to bf16, leaves ints alone,
    and keeps the recon-3d sub-losses' shared-tree aliasing (one R-Net on
    device, not seven)."""
    from gan_control_tpu.losses.registry import cast_predictor_params

    shared = {
        "w": jnp.ones((4, 4), jnp.float32),
        "steps": jnp.array(3, jnp.int32),
    }
    params = {
        "recon_3d_loss": shared,
        "recon_gamma_loss": shared,  # aliased, as build_attr_losses does
        "embedding_loss": {"w": jnp.zeros((2,), jnp.float32)},
    }
    out = cast_predictor_params(params, "bfloat16")
    assert out["recon_3d_loss"]["w"].dtype == jnp.bfloat16
    assert out["recon_3d_loss"]["steps"].dtype == jnp.int32
    assert out["embedding_loss"]["w"].dtype == jnp.bfloat16
    # aliasing preserved: the two recon entries are the SAME cast tree
    assert out["recon_3d_loss"] is out["recon_gamma_loss"]
    # f32 is the identity (no copies, no new trees)
    same = cast_predictor_params(params, "float32")
    assert same is params


def test_trainer_casts_battery_params_under_bf16_plan(tmp_path):
    """GeneratorTrainer with training_config.predictor_dtype='bfloat16'
    stores the frozen battery params in bf16 (the param-read half of the
    bf16-battery HBM saving, TRAINING.md roofline)."""
    from tests.test_trainer import tiny_config

    config = tiny_config(tmp_path)
    config["training_config"]["predictor_dtype"] = "bfloat16"
    from gan_control_tpu.trainers.generator_trainer import GeneratorTrainer

    pred_params = {"embedding_loss": {"w": jnp.ones((4, 4), jnp.float32),
                                      "n": jnp.array(1, jnp.int32)}}
    tr = GeneratorTrainer(
        config=config, init_dirs=False, predictor_params=pred_params,
    )
    leaves = jax.tree_util.tree_leaves(tr.predictor_params)
    float_leaves = [l for l in leaves if jnp.issubdtype(l.dtype, jnp.floating)]
    assert float_leaves
    assert all(l.dtype == jnp.bfloat16 for l in float_leaves)


def test_int8_quantize_roundtrip_and_aliasing():
    """cast_predictor_params(..., 'int8') stores {"q","s"} int8 leaves;
    dequantize restores values to within half a quantization step; shared
    trees stay aliased; integer leaves pass through."""
    from gan_control_tpu.losses.registry import (
        cast_predictor_params,
        dequantize_predictor_params,
    )

    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((16, 16)).astype(np.float32))
    shared = {"w": w, "steps": jnp.array(3, jnp.int32)}
    params = {"recon_3d_loss": shared, "recon_gamma_loss": shared}
    q = cast_predictor_params(params, "int8")
    assert q["recon_3d_loss"] is q["recon_gamma_loss"]
    leaf = q["recon_3d_loss"]["w"]
    assert set(leaf.keys()) == {"q", "s"}
    assert leaf["q"].dtype == jnp.int8
    assert q["recon_3d_loss"]["steps"].dtype == jnp.int32

    deq = dequantize_predictor_params(q, jnp.float32)
    step = float(leaf["s"])
    np.testing.assert_allclose(
        np.asarray(deq["recon_3d_loss"]["w"]), np.asarray(w),
        atol=step / 2 + 1e-7,
    )
    assert deq["recon_3d_loss"]["steps"].dtype == jnp.int32


def test_train_step_predictor_dtype_int8():
    """predictor_dtype='int8': the battery's quantized params are
    dequantized INSIDE the jitted g_step to bf16 (compute dtype), images
    arrive bf16, loss math stays f32 and finite."""
    from gan_control_tpu.latent.groups import GroupSpec, LatentGroup
    from gan_control_tpu.losses.contrastive import (
        ContrastiveConfig,
        pairwise_sq_l2,
    )
    from gan_control_tpu.losses.registry import cast_predictor_params
    from gan_control_tpu.models.discriminator import Discriminator
    from gan_control_tpu.models.generator import Generator
    from gan_control_tpu.training.state import (
        init_gan_state,
        make_gan_optimizers,
    )
    from gan_control_tpu.training.train_step import (
        AttributeLossSpec,
        TrainStepConfig,
        make_train_steps,
    )

    size, batch, style = 16, 8, 64
    spec = GroupSpec(
        groups=(
            LatentGroup("id", 0, 32, mb_start=0, mb_end=4),
            LatentGroup("other", 32, 64, mb_start=4, mb_end=8),
        ),
        mini_batch=batch,
        style_dim=style,
    )
    gen = Generator(size=size, style_dim=style, n_mlp=2, split_fc=True,
                    fc_groups=spec.fc_dims(), max_channels=32)
    disc = Discriminator(size=size, max_channels=32)
    g_tx, d_tx = make_gan_optimizers(
        {"lr_g": 2e-3, "lr_d": 2e-3, "g_reg_every": 4, "d_reg_every": 16}
    )

    w_true = jnp.asarray(
        np.random.default_rng(1).standard_normal((3, 4)).astype(np.float32)
    )
    seen = {}

    def spy_features(params, images):
        seen["img_dtype"] = images.dtype
        seen["w_dtype"] = params["w"].dtype
        emb = jnp.mean(images, axis=(1, 2)) @ params["w"].astype(images.dtype)
        return [emb]

    attr = (
        AttributeLossSpec(
            name="embedding_loss",
            group="id",
            cfg=ContrastiveConfig(
                intermediate_weights=(), last_layer_weight=1.0,
                lower_thres=(), upper_thres=(),
                last_lower_thres=0.1, last_upper_thres=1.0,
                focus_on=("same_as_last_layer",),
            ),
            feature_fn=spy_features,
            dist_fn=pairwise_sq_l2,
        ),
    )
    cfg = TrainStepConfig(batch=batch, mini_batch=batch, style_dim=style,
                          predictor_dtype="int8")
    steps = make_train_steps(gen, disc, cfg, spec=spec, attr_losses=attr,
                             g_tx=g_tx, d_tx=d_tx)
    state = init_gan_state(gen, disc, g_tx, d_tx, jax.random.PRNGKey(0),
                           style_dim=style)
    pred_params = cast_predictor_params(
        {"embedding_loss": {"w": w_true}}, "int8"
    )
    z = jax.random.normal(jax.random.PRNGKey(2), (batch, style))
    _, metrics = jax.jit(steps["g_step"])(state, (z,), pred_params)
    assert seen["img_dtype"] == jnp.bfloat16
    assert seen["w_dtype"] == jnp.bfloat16
    # dequantized values approximate the originals (int8 + bf16 rounding):
    # verified host-side on the same quantized tree (the in-step dequant is
    # the same registry function, exercised above via the spy dtypes)
    from gan_control_tpu.losses.registry import dequantize_predictor_params

    deq = dequantize_predictor_params(pred_params, jnp.bfloat16)
    np.testing.assert_allclose(
        np.asarray(deq["embedding_loss"]["w"], np.float32),
        np.asarray(w_true), atol=0.05,
    )
    assert metrics["g_embedding_loss"].dtype == jnp.float32
    assert np.isfinite(float(metrics["g_loss"]))
