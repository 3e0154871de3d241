"""GeneratorTrainer end-to-end smoke on a tiny config: a few training
iterations with synthetic data, image/checkpoint saving, metrics JSONL,
and resume-from-checkpoint."""

import json

import numpy as np
import pytest

import jax

from gan_control_tpu.trainers.generator_trainer import GeneratorTrainer
from gan_control_tpu.utils import checkpoint as ckpt_lib


def tiny_config(tmp_path):
    return {
        "save_name": "tiny",
        "results_dir": str(tmp_path / "results"),
        "add_weight_to_name": False,
        "model_config": {
            "vanilla": False,
            "img_channels": 3,
            "split_fc": True,
            "marge_fc": False,
            "latent_size": 64,
            "size": 16,
            "n_mlp": 2,
            "channel_multiplier": 0.25,
            "max_channels": 32,
            "g_noise_mode": "normal",
        },
        "training_config": {
            "debug": True,
            "iter": 6,
            "start_iter": 0,
            "batch": 8,
            "mini_batch": 8,
            "mini_batch_mode": "normal",
            "augment": {"enabled": False},
            "sub_groups_dict": {
                "id": {"place_in_mini_batch": [0, 4], "place_in_latent": [0, 32]},
                "other": {"place_in_mini_batch": [4, 8], "place_in_latent": [32, 64]},
            },
            "r1": 1,
            "d_every": 1,
            "g_reg_every": 4,
            "d_reg_every": 4,
            "lr_g": 0.002,
            "lr_d": 0.002,
            "g_moving_average": 100,
            "path_regularize": 2,
            "path_batch_shrink": 2,
            "mixing": 0,
            "save_images_interval": 4,
            "save_nets_interval": 4,
        },
        "data_config": {"data_set_name": "synthetic", "path": ""},
        "evaluation_config": {
            "fid": {"enabled": False},
            "separability": {"enabled": False},
        },
        "tensorboard_config": {"enabled": False},
        "monitor_config": {"enabled": False},
        "ckpt_config": {"enabled": False, "ckpt": "no_ckpt"},
    }


@pytest.mark.slow
def test_trainer_end_to_end(tmp_path):
    cfg = tiny_config(tmp_path)
    trainer = GeneratorTrainer(config=cfg)
    assert (trainer.save_dir / "args.json").exists()

    trainer.train(6)

    ckpts = sorted((trainer.save_dir / "checkpoint").glob("*.ckpt"))
    assert ckpts, "no checkpoints written"
    # metrics were tracked
    assert trainer.metrics_history
    assert all(np.isfinite(v["g_loss"]) for v in trainer.metrics_history)
    # sample grid + per-group matrices saved at iter 4
    assert (trainer.save_dir / "images" / "samples" / "000004.jpg").exists()
    assert (trainer.save_dir / "images" / "id" / "000004.jpg").exists()
    # metrics JSONL exists
    assert (trainer.save_dir / "metrics.jsonl").exists()

    # resume: new trainer from the last checkpoint
    cfg2 = tiny_config(tmp_path)
    cfg2["ckpt_config"] = {"enabled": True, "ckpt": str(ckpts[-1])}
    trainer2 = GeneratorTrainer(config=cfg2, init_dirs=False)
    assert trainer2.start_iter == ckpt_lib.parse_step(ckpts[-1])
    assert int(trainer2.state.step) > 0


@pytest.mark.slow
def test_trainer_random_mini_batch_mode(tmp_path):
    """mini_batch_mode='random': a FRESH random group placement EVERY step,
    fed into ONE compiled g_step as arrays — zero recompiles (the TPU answer
    to RandomMiniBatchUtils re-randomizing per iteration, reference
    mini_batch_random_multi_split_utils.py:45-68)."""
    from gan_control_tpu.latent.groups import random_arrangement

    cfg = tiny_config(tmp_path)
    cfg["training_config"]["mini_batch_mode"] = "random"
    cfg["training_config"]["iter"] = 3
    for g in cfg["training_config"]["sub_groups_dict"].values():
        g["count_in_mini_bach"] = [2, 6]
    trainer = GeneratorTrainer(config=cfg, init_dirs=False)
    assert trainer._arrangement_rng is not None

    # the deterministic placement stream varies across steps
    probe = np.random.default_rng(cfg["training_config"].get("seed", 0) + 17)
    arrs = [random_arrangement(trainer.spec, probe) for _ in range(6)]
    assert any(
        not np.array_equal(arrs[0].share_mask, a.share_mask) for a in arrs[1:]
    ), "placement stream never varies"

    m = trainer.one_iteration(0)
    jax.block_until_ready(m)
    compiles_after_first = trainer._g_step._cache_size()
    for i in range(1, 3):
        m = trainer.one_iteration(i)
    jax.block_until_ready(m)
    assert np.isfinite(float(m["g_loss"]))
    # per-step placements did NOT trigger recompiles
    assert trainer._g_step._cache_size() == compiles_after_first

    # dry_run must not advance the ARRANGEMENT stream either (it restores
    # the host rng; in random mode a perturbed placement stream would
    # diverge a resumed run — and, multi-host, break SPMD lockstep)
    before = trainer._arrangement_rng.bit_generator.state
    trainer.dry_run()
    assert trainer._arrangement_rng.bit_generator.state == before


def test_shipped_configs_have_inception_weights():
    """Config-schema check: every shipped fid block carries the pretrained
    inception weights path (the reference loads FID weights unconditionally,
    fid_utils/inception.py:23-60)."""
    from pathlib import Path

    cfg_dir = Path(__file__).resolve().parents[1] / "gan_control_tpu" / "configs"
    for p in sorted(cfg_dir.glob("*.json")):
        cfg = json.loads(p.read_text())
        fid = cfg.get("evaluation_config", {}).get("fid", {})
        if fid.get("enabled"):
            assert fid.get("inception_weights"), f"{p.name}: fid.inception_weights missing"


@pytest.mark.slow
def test_trainer_fid_weight_wiring(tmp_path):
    """evaluate_fid: skips (returns None) when inception_weights is absent;
    with a converted torch checkpoint, scoring the generator's own
    distribution against stats built from the identical sample stream gives
    FID ~ 0 — proving the converted weights (not random ones) are in the
    feature path."""
    import torch

    from test_inception_conversion import TorchInception
    from gan_control_tpu.evaluation import fid as fid_lib
    from gan_control_tpu.evaluation.inception import convert_torch_weights

    torch.manual_seed(11)
    tm = TorchInception().eval()
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.05)
                m.running_var.uniform_(0.7, 1.3)
    wpath = tmp_path / "incep.pth"
    torch.save(tm.state_dict(), str(wpath))

    cfg = tiny_config(tmp_path)
    stats_path = tmp_path / "stats.pkl"
    cfg["evaluation_config"]["fid"] = {
        "enabled": True,
        "inception_stat_path": str(stats_path),
        "num_of_samples": 16,
        "fid_interval": 1,
    }
    trainer = GeneratorTrainer(config=cfg, init_dirs=False)

    # stats missing -> skip
    assert trainer.evaluate_fid() is None

    # build stats from the SAME generator stream evaluate_fid will draw
    params = convert_torch_weights(str(wpath))
    feature_fn = fid_lib.make_feature_fn(params)
    batch = cfg["training_config"]["batch"]
    style = trainer.step_cfg.style_dim
    g_ema = trainer.state.g_ema

    import jax.numpy as jnp

    @jax.jit
    def _gen_batch(gp, rng):
        k1, k2 = jax.random.split(rng)
        z = jax.random.normal(k1, (batch, style))
        img, _ = trainer.generator.apply(gp, [z], rngs={"noise": k2})
        return jnp.clip(img * 0.5 + 0.5, 0.0, 1.0)

    feats = fid_lib.extract_features_from_generator(
        lambda r: _gen_batch(g_ema, r), feature_fn, 16, batch, jax.random.PRNGKey(0)
    )
    mu, cov = fid_lib.compute_stats(feats)
    fid_lib.save_stats(stats_path, mu, cov)

    # stats present, weights missing -> still skip (never silently-random)
    assert trainer.evaluate_fid() is None

    trainer.fid_cfg["inception_weights"] = str(wpath)
    fid = trainer.evaluate_fid()
    assert fid is not None and fid < 1e-3, fid


@pytest.mark.slow
def test_trainer_separability_buckets(tmp_path):
    """evaluate_separability registers scalar stats AND saves the worst
    same-pair "bucket" grid (reference tracker.py:303-311)."""
    import jax.numpy as jnp

    from gan_control_tpu.losses.contrastive import ContrastiveConfig, pairwise_sq_l2
    from gan_control_tpu.training.train_step import AttributeLossSpec

    def fake_features(params, images):
        del params
        return [jnp.mean(images, axis=(1, 2))]

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
            feature_fn=fake_features,
            dist_fn=pairwise_sq_l2,
        ),
    )
    cfg = tiny_config(tmp_path)
    cfg["evaluation_config"]["separability"] = {
        "enabled": True,
        "losses": ["embedding_loss"],
        "separability_interval": 1,
    }
    trainer = GeneratorTrainer(
        config=cfg, attr_losses=attr, predictor_params={"embedding_loss": {}}
    )
    trainer.evaluate_separability(1)
    assert any(
        k.startswith("separability/embedding_loss")
        for k in trainer.tracker.evaluation_dict
    )
    bucket = trainer.save_dir / "buckets" / "embedding_loss" / "000001.jpg"
    assert bucket.exists(), "worst-pair bucket grid not saved"


def test_eval_due_debug_gates(tmp_path):
    """Debug mode forces each eval kind every 100 iters IN ADDITION to the
    configured interval (reference tracker.py:132-158)."""
    cfg = tiny_config(tmp_path)
    cfg["training_config"]["debug"] = True
    trainer = GeneratorTrainer(config=cfg, init_dirs=False)
    assert trainer._eval_due(100, 30000)       # debug kicker
    assert not trainer._eval_due(50, 30000)    # not a debug multiple
    assert trainer._eval_due(30000, 30000)     # configured interval
    assert not trainer._eval_due(0, 30000)     # never at/before start

    cfg2 = tiny_config(tmp_path)
    cfg2["training_config"]["debug"] = False
    t2 = GeneratorTrainer(config=cfg2, init_dirs=False)
    assert not t2._eval_due(100, 30000)
    assert t2._eval_due(30000, 30000)


def test_annotate_attribute_images_kinds():
    """Each annotation kind changes pixels and returns [0,1] images of the
    input shape (pose axes, age/expression/hair text, combined)."""
    from gan_control_tpu.evaluation.attribute_evals import annotate_attribute_images

    rng = np.random.default_rng(0)
    imgs = rng.uniform(0.2, 0.8, size=(2, 64, 64, 3)).astype(np.float32)
    cases = {
        "orientation_loss": np.array([[30.0, 10.0, -5.0], [-30.0, 0.0, 0.0]]),
        "age_loss": np.array([25.0, 60.0]),
        "expression_loss": np.array([0, 5]),
        "hair_loss": np.array([[0.5, 0.3, 0.2], [0.1, 0.1, 0.1]]),
    }
    for loss_name, preds in cases.items():
        out = annotate_attribute_images(loss_name, imgs, preds)
        assert out.shape == imgs.shape
        assert out.min() >= 0.0 and out.max() <= 1.0
        assert not np.allclose(out, imgs), loss_name
    combined = annotate_attribute_images(
        "attribute", imgs, cases["orientation_loss"],
        extra_preds=cases["expression_loss"],
    )
    assert not np.allclose(combined, imgs)


@pytest.mark.slow
def test_trainer_saves_annotated_matrices(tmp_path, monkeypatch):
    """save_images writes the annotated attribute matrices next to the
    plain per-group grids (reference images/<kind>_matrix/%06d.jpg,
    generator_trainer.py:792-850)."""
    import jax.numpy as jnp

    from gan_control_tpu.losses.contrastive import ContrastiveConfig, pairwise_sq_l2
    from gan_control_tpu.training.train_step import AttributeLossSpec

    def spec_for(name, group):
        return AttributeLossSpec(
            name=name, group=group,
            cfg=ContrastiveConfig(
                intermediate_weights=(), last_layer_weight=1.0,
                lower_thres=(), upper_thres=(),
                last_lower_thres=0.1, last_upper_thres=1.0,
                focus_on=("same_as_last_layer",),
            ),
            feature_fn=lambda p, x: [jnp.mean(x, axis=(1, 2))],
            dist_fn=pairwise_sq_l2,
        )

    attr = (
        spec_for("embedding_loss", "id"),
        spec_for("orientation_loss", "other"),
        spec_for("expression_loss", "other"),
    )
    params = {"embedding_loss": {}, "orientation_loss": {}, "expression_loss": {}}
    cfg = tiny_config(tmp_path)
    trainer = GeneratorTrainer(config=cfg, attr_losses=attr, predictor_params=params)

    # stub the heavy predictor forwards; the save/annotate path stays real
    outs = {"orientation_loss": 3, "expression_loss": 1}

    def fake_predict_fn(loss_name):
        def fn(p, x):
            if outs[loss_name] == 1:
                return jnp.zeros((x.shape[0],), jnp.int32)
            return jnp.zeros((x.shape[0], outs[loss_name]))
        return fn

    monkeypatch.setattr(trainer, "_matrix_predict_fn", fake_predict_fn)
    trainer.save_images(1)

    img = trainer.save_dir / "images"
    assert (img / "other" / "000001.jpg").exists()
    assert (img / "orientation_matrix" / "000001.jpg").exists()
    assert (img / "expression_matrix" / "000001.jpg").exists()
    # combined attribute matrix rides the id-group matrix
    assert (img / "attribute_matrix" / "000001.jpg").exists()
    # no age loss enabled -> no age matrix
    assert not (img / "age_matrix").exists()


def test_remat_predictors_resolution(tmp_path):
    """remat_predictors defaults OFF under the bf16-no-remat memory plan
    (measured ~21 ms/step win on v5e) and ON for f32/remat plans;
    model_config.remat_predictors overrides either way."""
    cases = [
        ({"mixed_precision": True}, False),
        ({"mixed_precision": True, "remat": True}, True),
        ({}, True),
        ({"mixed_precision": True, "remat_predictors": True}, True),
        ({"mixed_precision": False, "remat_predictors": False}, False),
    ]
    for extra, want in cases:
        cfg = tiny_config(tmp_path)
        cfg["model_config"].update(extra)
        trainer = GeneratorTrainer(config=cfg, init_dirs=False)
        assert trainer.step_cfg.remat_predictors is want, (extra, want)


def test_async_checkpoint_roundtrip(tmp_path):
    """save_checkpoint_async: device->host copy on the caller thread (safe
    vs buffer donation), encode+write in the background; restore matches,
    ordering holds (single worker), and wait_pending_saves drains."""
    import jax.numpy as jnp

    state = {"w": jnp.arange(8, dtype=jnp.float32), "step": jnp.int32(3)}
    f1 = ckpt_lib.save_checkpoint_async(tmp_path, state, 1)
    state2 = {"w": jnp.arange(8, dtype=jnp.float32) * 2, "step": jnp.int32(4)}
    f2 = ckpt_lib.save_checkpoint_async(tmp_path, state2, 1)  # same file
    ckpt_lib.wait_pending_saves()
    assert f1.result().name == f2.result().name == "000001.ckpt"
    got = ckpt_lib.restore_checkpoint(
        tmp_path / "000001.ckpt", {"w": jnp.zeros(8), "step": jnp.int32(0)}
    )
    np.testing.assert_allclose(np.asarray(got["w"]), np.arange(8) * 2)
    assert int(got["step"]) == 4


def test_eval_jit_programs_are_cached(tmp_path, monkeypatch):
    """The eval-path jitted programs (attribute hist gen+predict,
    separability synthesis) are built ONCE per loss/trainer, not re-traced
    every eval interval — a fresh closure per call would recompile the
    512² synthesis graph each time (minutes over a remote-compile link)."""
    import jax.numpy as jnp

    from gan_control_tpu.losses import registry
    from gan_control_tpu.losses.contrastive import ContrastiveConfig, pairwise_sq_l2
    from gan_control_tpu.training.train_step import AttributeLossSpec

    attr = (
        AttributeLossSpec(
            name="orientation_loss", group="other",
            cfg=ContrastiveConfig(
                intermediate_weights=(), last_layer_weight=1.0,
                lower_thres=(), upper_thres=(),
                last_lower_thres=0.1, last_upper_thres=1.0,
                focus_on=("same_as_last_layer",),
            ),
            feature_fn=lambda p, x: [jnp.mean(x, axis=(1, 2))],
            dist_fn=pairwise_sq_l2,
        ),
    )
    trainer = GeneratorTrainer(
        config=tiny_config(tmp_path), attr_losses=attr,
        predictor_params={"orientation_loss": {}},
    )

    traces = {"n": 0}

    class StubPredictor:
        @staticmethod
        def make_model(cfg):
            return None

        @staticmethod
        def predict(model, pp, img):
            traces["n"] += 1  # runs at TRACE time only
            return jnp.zeros((img.shape[0], 3))

    monkeypatch.setitem(registry.PREDICTOR_MODULES, "orientation_loss", "stub")
    monkeypatch.setattr(registry, "_load_predictor", lambda name: StubPredictor)

    kc = {"num_of_samples": 8}
    trainer.evaluate_attribute_hist(1, "orientation_hist", "orientation_loss", kc)
    trainer.evaluate_attribute_hist(2, "orientation_hist", "orientation_loss", kc)
    assert traces["n"] == 1, f"gen+predict re-traced: {traces['n']} traces"
    assert len(trainer._attr_hist_fns) == 1

    # separability synthesis program: one cached jit per trainer
    trainer.evaluate_separability(1)
    first = trainer._separability_gen_fn
    trainer.evaluate_separability(2)
    assert trainer._separability_gen_fn is first


def test_partial_load_strictness():
    """Transfer loading keeps target 'style' (mapping) leaves on mismatch
    but RAISES for main-network mismatches like the reference
    (gan_model.py:649-656); strict=False restores permissive keep-target."""
    import jax.numpy as jnp
    import pytest as _pytest

    from gan_control_tpu.utils.transfer import partial_load

    target = {"params": {"style": {"kernel": jnp.zeros((4, 4))},
                         "conv1": {"kernel": jnp.zeros((3, 3))}}}
    ok_src = {"params": {"style": {"kernel": jnp.ones((8, 8))},  # mismatch OK
                         "conv1": {"kernel": jnp.ones((3, 3))}}}
    out = partial_load(target, ok_src)
    np.testing.assert_allclose(out["params"]["style"]["kernel"],
                               np.zeros((4, 4)))  # kept target
    np.testing.assert_allclose(out["params"]["conv1"]["kernel"],
                               np.ones((3, 3)))  # loaded

    bad_src = {"params": {"style": {"kernel": jnp.ones((4, 4))},
                          "conv1": {"kernel": jnp.ones((5, 5))}}}  # main net!
    with _pytest.raises(ValueError, match="main\\s+network"):
        partial_load(target, bad_src)
    out = partial_load(target, bad_src, strict=False)
    np.testing.assert_allclose(out["params"]["conv1"]["kernel"],
                               np.zeros((3, 3)))


def test_parse_step_keeps_configured_start_iter():
    """Resuming from best_fid.ckpt must not clobber start_iter with 0
    (reference try/except ValueError, generator_trainer.py:180-185)."""
    assert ckpt_lib.parse_step("checkpoint/000300.ckpt") == 300
    assert ckpt_lib.parse_step("checkpoint/best_fid.ckpt", default=300000) == 300000


def test_async_save_failures_reraise(tmp_path):
    """wait_pending_saves surfaces a failed background save instead of
    letting training 'complete' with zero usable checkpoints."""
    import pytest as _pytest

    bad_dir = tmp_path / "file-not-dir"
    bad_dir.write_text("x")  # mkdir under a FILE fails in the worker
    ckpt_lib.save_checkpoint_async(bad_dir / "checkpoint", {"a": np.zeros(2)}, 1)
    with _pytest.raises(Exception):
        ckpt_lib.wait_pending_saves()


def test_eval_only_separability_predictor(tmp_path, monkeypatch):
    """Separability losses enabled only in evaluation_config get a
    standalone predictor built from the registry (the reference's
    init_evaluation LossModelClasses, generator_trainer.py:278-299) —
    previously they were silently skipped."""
    import jax.numpy as jnp

    from gan_control_tpu.losses import registry
    from gan_control_tpu.losses.contrastive import ContrastiveConfig, pairwise_sq_l2
    from gan_control_tpu.training.train_step import AttributeLossSpec

    cfg = tiny_config(tmp_path)
    cfg["training_config"]["orientation_loss"] = {
        "enabled": False, "same_group_name": "id",
    }
    cfg["evaluation_config"]["separability"] = {
        "enabled": True, "separability_interval": 1, "num_of_samples": 16,
        "losses": ["orientation_loss"],
    }

    def fake_build(tc, rng=None):
        assert tc["orientation_loss"]["enabled"]  # re-enabled for eval
        spec = AttributeLossSpec(
            name="orientation_loss", group="id",
            cfg=ContrastiveConfig(
                intermediate_weights=(), last_layer_weight=1.0,
                lower_thres=(), upper_thres=(),
                last_lower_thres=0.1, last_upper_thres=1.0,
                focus_on=("same_as_last_layer",),
            ),
            feature_fn=lambda p, x: [jnp.mean(x, axis=(1, 2))],
            dist_fn=pairwise_sq_l2,
        )
        return (spec,), {"orientation_loss": {}}

    monkeypatch.setattr(registry, "build_attr_losses", fake_build)
    trainer = GeneratorTrainer(config=cfg)  # NO attr_losses
    trainer.evaluate_separability(100)
    keys = [k for k in trainer.tracker.evaluation_dict
            if k.startswith("separability/orientation_loss")]
    assert keys, "eval-only separability produced no scalars"
