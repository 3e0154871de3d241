"""Phase-2 end-to-end: synthesize a tiny phase-1 model dir (args.json +
checkpoint, the reference layout), build an attributes DataFrame, train a
controller for a few steps, and drive Controller.gen_batch_by_controls."""

import json

import numpy as np
import pandas as pd
import pytest

import jax
import jax.numpy as jnp

from gan_control_tpu.models.factory import build_generator, build_group_spec
from gan_control_tpu.utils import checkpoint as ckpt_lib
from gan_control_tpu.utils.config import write_json

STYLE = 64
SIZE = 16


def tiny_model_config():
    return {
        "save_name": "tiny",
        "model_config": {
            "vanilla": False,
            "img_channels": 3,
            "split_fc": True,
            "marge_fc": False,
            "latent_size": STYLE,
            "size": SIZE,
            "n_mlp": 2,
            "channel_multiplier": 0.25,
            "max_channels": 32,
            "g_noise_mode": "normal",
        },
        "training_config": {
            "batch": 8,
            "mini_batch": 8,
            "sub_groups_dict": {
                "orientation": {"place_in_mini_batch": [0, 4], "place_in_latent": [0, 32]},
                "other": {"place_in_mini_batch": [4, 8], "place_in_latent": [32, 64]},
            },
        },
    }


@pytest.fixture(scope="module")
def phase1_dir(tmp_path_factory):
    """A saved phase-1 model dir in the reference layout."""
    root = tmp_path_factory.mktemp("phase1")
    config = tiny_model_config()
    write_json(config, root / "args.json")
    spec = build_group_spec(config)
    gen = build_generator(config, spec)
    z = jnp.zeros((1, STYLE))
    params = gen.init({"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}, [z])
    # the trainer state-dict shape: at least a 'g_ema' entry
    ckpt_lib.save_checkpoint(root / "checkpoint", {"g_ema": params}, 1)
    return root


def test_inference_loads_and_generates(phase1_dir):
    from gan_control_tpu.inference.inference import Inference

    inf = Inference(phase1_dir)
    img, latent, latent_w = inf.gen_batch(batch_size=2, rng=jax.random.PRNGKey(0))
    assert img.shape == (2, SIZE, SIZE, 3)
    assert float(img.min()) >= 0.0 and float(img.max()) <= 1.0
    assert latent_w.shape[0] == 2 and latent_w.shape[-1] == STYLE

    # static noise is a FRESH per-call realization (reference reset_noise
    # inside gen_batch, inference.py:69-71): deterministic in rng, varying
    # across rngs. (Image-level variation is invisible here — untrained
    # noise weights are zero-init — so assert on the planes themselves.)
    img_same, _, _ = inf.gen_batch(batch_size=2, latent=latent,
                                   rng=jax.random.PRNGKey(0))
    n0 = [np.asarray(x) for x in inf.noise]
    np.testing.assert_allclose(np.asarray(img), np.asarray(img_same), atol=1e-6)
    inf.gen_batch(batch_size=2, latent=latent, rng=jax.random.PRNGKey(9))
    n9 = [np.asarray(x) for x in inf.noise]
    assert any(not np.allclose(a, b) for a, b in zip(n0, n9))
    inf.gen_batch(batch_size=2, latent=latent, rng=jax.random.PRNGKey(0))
    for a, b in zip(n0, [np.asarray(x) for x in inf.noise]):
        np.testing.assert_allclose(a, b, atol=0)


def test_controller_training_and_inference(phase1_dir, tmp_path):
    from gan_control_tpu.trainers.controller_trainer import ControllerTrainer
    from gan_control_tpu.inference.controller import Controller

    # phase-2a stand-in: random orientation + w rows
    rng = np.random.default_rng(0)
    n = 200
    df = pd.DataFrame(
        {
            "orientation": [rng.normal(size=3).astype(np.float32) for _ in range(n)],
            "latents_w": [rng.normal(size=STYLE).astype(np.float32) for _ in range(n)],
        }
    )
    df_path = tmp_path / "attributes_df.pkl"
    df.to_pickle(df_path)

    cfg = {
        "save_name": "orientation_ctrl",
        "results_dir": str(tmp_path / "controllers"),
        "model_config": {
            "latent_size": STYLE,
            "size": SIZE,
            "lr_mlp": 0.01,
            "n_mlp": 2,
            "in_dim": 3,
            "mid_dim": 32,
            "loss": "orientation_loss",
        },
        "training_config": {
            "debug": True,
            "rec_loss": "l1",
            "generator_dir": str(phase1_dir),
            "iter": 20,
            "batch": 16,
            "reg_every": 4,
            "lr": 0.002,
            "generate_controls": "sampled_df",
            "sampled_df_path": str(df_path),
            "min_evaluate_interval": 10,
            "save_nets_interval": 10,
            "losses": ["latent_rec"],
        },
    }
    trainer = ControllerTrainer(config=cfg)
    trainer.train(20)
    assert trainer.metrics_history
    assert np.isfinite(trainer.metrics_history[-1]["latent_rec_loss"])
    assert "eval_latent_rec" in trainer.metrics_history[-1]

    # the save dir is self-contained: generator copy + controller ckpts
    cdir = trainer.save_dir.parent
    # Controller discovers by group-name prefix within the parent dir —
    # the trainer names its dir '<group>_<save_name>_...'
    assert (trainer.save_dir / "generator" / "args.json").exists()
    assert list((trainer.save_dir / "checkpoint").glob("*.ckpt"))

    # build the Controller layout: controller_dir with 'generator' + group dir
    controller_root = tmp_path / "controller_root"
    controller_root.mkdir()
    import shutil

    shutil.copytree(trainer.save_dir / "generator", controller_root / "generator")
    shutil.copytree(trainer.save_dir, controller_root / "orientation_ctrl",
                    ignore=shutil.ignore_patterns("generator"))

    ctrl = Controller(controller_root)
    assert "orientation" in ctrl.fc_controls
    orientation = jnp.asarray([[20.0, 5.0, 0.0], [-20.0, 5.0, 0.0]])
    img, latent, latent_w = ctrl.gen_batch_by_controls(
        batch_size=2, rng=jax.random.PRNGKey(0), orientation=orientation
    )
    assert img.shape == (2, SIZE, SIZE, 3)
    # the controlled group slice equals the controller output
    want = ctrl.generate_group_w_latent("orientation", orientation)
    got = latent_w[:, 0, :32] if latent_w.ndim == 3 else latent_w[:, :32]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5)


def test_gen_batch_group_randomize(phase1_dir):
    """input_is_latent + <group>='random' re-randomizes only that group's
    w slice (the reference's intended :62-68 semantics)."""
    from gan_control_tpu.inference.inference import Inference

    inf = Inference(phase1_dir)
    w = inf.model.apply(inf.params, jnp.zeros((2, STYLE)), method="map_latent")
    img, latent, _ = inf.gen_batch(
        batch_size=2, latent=w, input_is_latent=True,
        rng=jax.random.PRNGKey(0), orientation="random",
    )
    latent = np.asarray(latent)
    w = np.asarray(w)
    g = inf.spec.group("orientation")
    assert not np.allclose(latent[:, g.latent_start:g.latent_end],
                           w[:, g.latent_start:g.latent_end])
    np.testing.assert_allclose(latent[:, g.latent_end:], w[:, g.latent_end:])


def test_controller_attribute_rec(phase1_dir, tmp_path):
    """attribute_rec: the controller loss backprops through the frozen G
    and a predictor (fake here) to match target controls
    (reference controller_trainer.py:231-239)."""
    import pandas as pd
    from gan_control_tpu.trainers.controller_trainer import ControllerTrainer

    rng = np.random.default_rng(1)
    n = 100
    df = pd.DataFrame(
        {
            "orientation": [rng.normal(size=3).astype(np.float32) for _ in range(n)],
            "latents_w": [rng.normal(size=STYLE).astype(np.float32) for _ in range(n)],
        }
    )
    df_path = tmp_path / "df.pkl"
    df.to_pickle(df_path)

    def fake_predict(images):
        # differentiable image -> 3-vector "orientation"
        return jnp.mean(images, axis=(1, 2)) * 100.0

    cfg = {
        "save_name": "attr_rec",
        "results_dir": str(tmp_path / "c"),
        "model_config": {"latent_size": STYLE, "size": SIZE, "lr_mlp": 0.01,
                         "n_mlp": 2, "in_dim": 3, "mid_dim": 32,
                         "loss": "orientation_loss"},
        "training_config": {
            "rec_loss": "l1", "generator_dir": str(phase1_dir), "iter": 5,
            "batch": 8, "reg_every": 4, "lr": 0.002,
            "generate_controls": "sampled_df", "sampled_df_path": str(df_path),
            "min_evaluate_interval": 100, "save_nets_interval": 100,
            "losses": ["latent_rec", "attribute_rec"], "attribute_rec_w": 0.01,
        },
    }
    cfg["training_config"]["debug"] = True
    tr = ControllerTrainer(
        config=cfg, predict_fn=fake_predict,
        controller_criterion=lambda p, t: jnp.mean(jnp.abs(p - t)),
    )
    tr.train(5)
    assert tr.metrics_history
    last = tr.metrics_history[-1]
    assert np.isfinite(last["attribute_loss"])
    # held-out eval reports BOTH latent_rec and attribute_rec
    # (reference controller_trainer.py:292-335)
    assert np.isfinite(last["eval_latent_rec"])
    assert np.isfinite(last["eval_attribute_loss"])
    # dual real/pred grids saved per eval interval (reference :364-391)
    grids = sorted((tr.save_dir / "images" / "sample").glob("*.png"))
    assert grids, "no dual real/pred grid saved"


def test_controller_sharded_vs_single_device_parity(phase1_dir):
    """Phase-2b SPMD: the controller step (latent_rec + attribute_rec's
    frozen-G synthesis) sharded over the 8-device 'data' mesh produces the
    same trajectory as the 1-device run — the phase-2 analog of the phase-1
    8-vs-1 parity check. The batch (16) shards to 2 rows/device."""
    from jax.sharding import Mesh
    from gan_control_tpu.trainers.controller_trainer import ControllerTrainer

    def make_loader(seed):
        rng = np.random.default_rng(seed)

        def it():
            while True:
                yield (
                    rng.standard_normal((16, 3)).astype(np.float32),
                    rng.standard_normal((16, STYLE)).astype(np.float32),
                )

        return it()

    def build(mesh):
        cfg = {
            "model_config": {"latent_size": STYLE, "size": SIZE,
                             "lr_mlp": 0.01, "n_mlp": 2, "in_dim": 3,
                             "mid_dim": 32, "loss": "orientation_loss"},
            "training_config": {
                "rec_loss": "l1", "generator_dir": str(phase1_dir),
                "iter": 3, "batch": 16, "reg_every": 4, "lr": 0.002,
                "min_evaluate_interval": 1,
                "losses": ["latent_rec", "attribute_rec"],
                "attribute_rec_w": 0.01,
            },
        }
        tr = ControllerTrainer(
            config=cfg, init_dirs=False,
            predict_fn=lambda img: jnp.mean(img, axis=(1, 2)) * 100.0,
            controller_criterion=lambda p, t: jnp.mean(jnp.abs(p - t)),
            data_loader=(make_loader(0), None),
            mesh=mesh,
        )
        tr.train(3)
        return tr

    tr8 = build(None)  # all 8 virtual devices (the default mesh)
    assert tr8.mesh.devices.size == 8
    tr1 = build(Mesh(np.array(jax.devices()[:1]), ("data",)))

    for m8, m1 in zip(tr8.metrics_history, tr1.metrics_history):
        for k in ("loss", "latent_rec_loss", "attribute_loss"):
            np.testing.assert_allclose(m8[k], m1[k], rtol=2e-4, atol=1e-6)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6
        ),
        tr8.state.params, tr1.state.params,
    )


def test_make_attributes_df_cli(phase1_dir, tmp_path, monkeypatch):
    """Phase-2a CLI end-to-end on the tiny model (no predictors enabled in
    its config -> latents/latents_w columns only)."""
    import sys
    import pandas as pd
    import make_attributes_df as cli

    out = tmp_path / "df.pkl"
    monkeypatch.setattr(sys, "argv", [
        "make_attributes_df.py", "--model_dir", str(phase1_dir),
        "--batch_size", "4", "--number_of_samples", "8",
        "--save_path", str(out),
    ])
    cli.main()
    df = pd.read_pickle(out)
    assert len(df) == 8
    assert df.iloc[0]["latents"].shape == (STYLE,)
    assert df.iloc[0]["latents_w"].shape == (STYLE,)


def test_make_attributes_df_uses_control_extractor(phase1_dir, tmp_path, monkeypatch):
    """With a predictor block enabled, the CLI's columns come from the
    shared ControlExtractor battery (one predictor codepath for phase 2a
    and real-photo control extraction)."""
    import sys
    import shutil
    import pandas as pd
    import make_attributes_df as cli

    model_dir = tmp_path / "phase1_with_predictors"
    shutil.copytree(phase1_dir, model_dir)
    config = json.loads((model_dir / "args.json").read_text())
    config["training_config"]["orientation_loss"] = {"enabled": True}
    (model_dir / "args.json").write_text(json.dumps(config))

    out = tmp_path / "df.pkl"
    monkeypatch.setattr(sys, "argv", [
        "make_attributes_df.py", "--model_dir", str(model_dir),
        "--batch_size", "4", "--number_of_samples", "4",
        "--save_path", str(out),
    ])
    cli.main()
    df = pd.read_pickle(out)
    assert len(df) == 4
    assert df.iloc[0]["orientation"].shape == (3,)
    assert np.all(np.isfinite(np.stack(df["orientation"])))


def test_make_attributes_df_sharded_parity(phase1_dir, tmp_path, monkeypatch):
    """The phase-2a sweep shards over the 8-device mesh (batch_size
    divisible by the device count) and produces IDENTICAL rows to the
    --no_shard single-device run — sharding changes layout, not math."""
    import sys
    import shutil
    import pandas as pd
    import make_attributes_df as cli

    model_dir = tmp_path / "phase1_shard"
    shutil.copytree(phase1_dir, model_dir)
    config = json.loads((model_dir / "args.json").read_text())
    config["training_config"]["orientation_loss"] = {"enabled": True}
    (model_dir / "args.json").write_text(json.dumps(config))

    outs = {}
    for mode, flag in (("sharded", []), ("single", ["--no_shard"])):
        out = tmp_path / f"df_{mode}.pkl"
        monkeypatch.setattr(sys, "argv", [
            "make_attributes_df.py", "--model_dir", str(model_dir),
            "--batch_size", "8", "--number_of_samples", "8",
            "--save_path", str(out), *flag,
        ])
        cli.main()
        outs[mode] = pd.read_pickle(out)

    assert len(outs["sharded"]) == 8
    # predictor columns tolerate partitioned-reduction float drift (the
    # softmax-expectation spans ±99 degrees; observed ~1e-4 relative)
    for col, tol in (("latents", dict(atol=1e-5)),
                     ("latents_w", dict(atol=1e-5)),
                     ("orientation", dict(rtol=1e-3, atol=3e-2))):
        a = np.stack(outs["sharded"][col])
        b = np.stack(outs["single"][col])
        np.testing.assert_allclose(a, b, err_msg=col, **tol)


def test_controller_config_inventory():
    """Every shipped controller config parses and is launchable: the loss
    maps to a latent group, the attribute column resolves for its in_dim,
    and the trainer-required keys are present (reference
    configs/controller_configs/* inventory)."""
    from pathlib import Path

    from gan_control_tpu.data.dataframe import attribute_column_for
    from gan_control_tpu.trainers.controller_trainer import LOSS_TO_GROUP

    root = Path(__file__).resolve().parents[1] / "gan_control_tpu" / "configs" / "controller_configs"
    configs = sorted(root.rglob("*.json"))
    # the reference ships 11 controller configs; ours covers every dataset +
    # ablation variant (expression_q is an extra split of the default)
    assert len(configs) >= 11, [c.name for c in configs]
    datasets = {c.parent.name for c in configs}
    assert {"ffhq", "afhq", "metfaces"} <= datasets
    for path in configs:
        cfg = json.loads(path.read_text())
        mc, tc = cfg["model_config"], cfg["training_config"]
        assert mc["loss"] in LOSS_TO_GROUP, path.name
        assert attribute_column_for(mc["loss"], mc["in_dim"]), path.name
        for key in ("generator_dir", "iter", "batch", "lr", "sampled_df_path",
                    "min_evaluate_interval", "save_nets_interval", "losses"):
            assert key in tc, (path.name, key)
        assert tc["controller_type"] == "latent_w", path.name


def test_merged_attr_controller_on_vanilla_generator(tmp_path):
    """The merged-attribute path (reference merged_attr_w_latent_controller
    .json): a controller trained against a VANILLA generator predicts the
    FULL w latent from the control."""
    from gan_control_tpu.trainers.controller_trainer import ControllerTrainer

    # vanilla phase-1 dir
    root = tmp_path / "vanilla_phase1"
    root.mkdir()
    config = {
        "save_name": "vanilla_tiny",
        "model_config": {
            "vanilla": True,
            "img_channels": 3,
            "split_fc": False,
            "marge_fc": False,
            "latent_size": STYLE,
            "size": SIZE,
            "n_mlp": 2,
            "channel_multiplier": 0.25,
            "max_channels": 32,
            "g_noise_mode": "normal",
        },
        "training_config": {"batch": 8, "mini_batch": 8},
    }
    write_json(config, root / "args.json")
    gen = build_generator(config, build_group_spec(config))
    z = jnp.zeros((1, STYLE))
    params = gen.init({"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}, [z])
    ckpt_lib.save_checkpoint(root / "checkpoint", {"g_ema": params}, 1)

    rng = np.random.default_rng(0)
    n = 100
    df = pd.DataFrame(
        {
            "age": [np.float32(rng.uniform(15, 75)) for _ in range(n)],
            "latents_w": [rng.normal(size=STYLE).astype(np.float32) for _ in range(n)],
        }
    )
    df_path = tmp_path / "vanilla_df.pkl"
    df.to_pickle(df_path)

    cfg = {
        "save_name": "merged_attr",
        "results_dir": str(tmp_path / "controllers"),
        "model_config": {
            "latent_size": STYLE, "size": SIZE, "lr_mlp": 0.01, "n_mlp": 2,
            "in_dim": 1, "mid_dim": 32, "loss": "age_loss",
        },
        "training_config": {
            "debug": True, "rec_loss": "l1", "generator_dir": str(root),
            "iter": 10, "batch": 16, "reg_every": 4, "lr": 0.002,
            "generate_controls": "sampled_df", "sampled_df_path": str(df_path),
            "min_evaluate_interval": 5, "save_nets_interval": 10,
            "losses": ["latent_rec"],
        },
    }
    trainer = ControllerTrainer(config=cfg)
    # the controller's slice is the WHOLE latent
    assert trainer.group_slice == (0, STYLE)
    assert trainer.group_latent_size == STYLE
    trainer.train()
    last = trainer.metrics_history[-1]
    assert np.isfinite(last["latent_rec_loss"])


def test_merged_dataframe_loader(tmp_path):
    """MergedDataFrameDataset + its loader: all-attribute batches keyed by
    column, expression_q one-hot (reference merged_dataframe_dataset.py)."""
    from gan_control_tpu.data.dataframe import (
        NUM_EXPRESSION_CLASSES,
        get_merged_dataframe_data_loader,
    )

    rng = np.random.default_rng(0)
    n = 40
    df = pd.DataFrame(
        {
            "age": [np.float32(rng.uniform(15, 75)) for _ in range(n)],
            "orientation": [rng.normal(size=3).astype(np.float32) for _ in range(n)],
            "expression_q": [np.int64(rng.integers(0, 8)) for _ in range(n)],
            "latents_w": [rng.normal(size=STYLE).astype(np.float32) for _ in range(n)],
        }
    )
    df_path = tmp_path / "merged_df.pkl"
    df.to_pickle(df_path)

    loader, ds = get_merged_dataframe_data_loader(
        df_path, ["age", "orientation", "expression_q"], batch_size=8
    )
    assert len(ds) == 36  # 90% train split
    controls, w = next(loader)
    assert set(controls) == {"age", "orientation", "expression_q"}
    assert controls["age"].shape == (8, 1)
    assert controls["orientation"].shape == (8, 3)
    assert controls["expression_q"].shape == (8, NUM_EXPRESSION_CLASSES)
    np.testing.assert_allclose(controls["expression_q"].sum(axis=1), 1.0)
    assert w.shape == (8, STYLE)


def test_controller_attribute_rec_self_built(phase1_dir, tmp_path, monkeypatch):
    """The CLI path builds the attribute_rec predictor itself from the
    registry (reference init_loss, controller_trainer.py:154-163): no
    injected predict_fn needed; gamma routes through the shared R-Net
    features; expression_q refuses (no differentiable predictor — the
    reference's ESR9Criterion has no predict either)."""
    from gan_control_tpu.losses import registry
    from gan_control_tpu.trainers.controller_trainer import ControllerTrainer

    rng = np.random.default_rng(2)
    df = pd.DataFrame({
        "orientation": [rng.normal(size=3).astype(np.float32) for _ in range(40)],
        "gamma3d": [rng.normal(size=27).astype(np.float32) for _ in range(40)],
        "expression_q": [int(rng.integers(0, 8)) for _ in range(40)],
        "latents_w": [rng.normal(size=STYLE).astype(np.float32) for _ in range(40)],
    })
    df_path = tmp_path / "df.pkl"
    df.to_pickle(df_path)

    class StubPredictor:
        calls = []

        @staticmethod
        def make_model(cfg):
            return "stub-model"

        @staticmethod
        def init_params(model, key):
            return {"w": jnp.ones((1,))}

        @staticmethod
        def predict(model, pp, img):
            return jnp.mean(img, axis=(1, 2))  # [B,3] — differentiable

        @staticmethod
        def features(model, pp, img):
            return [jnp.mean(img, axis=(1, 2, 3), keepdims=False)[:, None]
                    * jnp.ones((1, 257))]

        @staticmethod
        def extract_feature(vec, which):
            StubPredictor.calls.append(which)
            return vec[:, :27]

        @staticmethod
        def controller_criterion(pred, target):
            return jnp.mean(jnp.abs(pred - target))

    monkeypatch.setattr(registry, "_load_predictor", lambda name: StubPredictor)

    def cfg_for(loss, in_dim, col):
        return {
            "save_name": f"{col}_ctrl",
            "results_dir": str(tmp_path / f"ctrl_{col}"),
            "model_config": {"latent_size": STYLE, "size": SIZE, "lr_mlp": 0.01,
                             "n_mlp": 2, "in_dim": in_dim, "mid_dim": 32,
                             "loss": loss},
            "training_config": {
                "debug": True, "rec_loss": "l1",
                "generator_dir": str(phase1_dir),
                "iter": 4, "batch": 8, "reg_every": 4, "lr": 0.002,
                "generate_controls": "sampled_df",
                "sampled_df_path": str(df_path),
                "min_evaluate_interval": 2, "save_nets_interval": 100,
                "losses": ["latent_rec", "attribute_rec"],
                "attribute_rec_w": 0.5,
            },
        }

    tr = ControllerTrainer(config=cfg_for("orientation_loss", 3, "orientation"),
                           init_dirs=False)
    tr.train(4)
    assert np.isfinite(tr.metrics_history[-1]["attribute_loss"])

    # gamma routes through the shared R-Net features -> 'gamma' extraction.
    # The tiny spec has no gamma group, so point the working group at
    # 'orientation' for the slice bookkeeping.
    monkeypatch.setitem(
        __import__("gan_control_tpu.trainers.controller_trainer",
                   fromlist=["LOSS_TO_GROUP"]).LOSS_TO_GROUP,
        "gamma_loss", "orientation",
    )
    tr_g = ControllerTrainer(config=cfg_for("gamma_loss", 27, "gamma3d"),
                             init_dirs=False)
    tr_g.train(2)
    assert "gamma" in StubPredictor.calls

    # expression_q refuses attribute_rec with a clear message (tiny spec
    # has no expression group: point it at orientation for the slice)
    monkeypatch.setitem(
        __import__("gan_control_tpu.trainers.controller_trainer",
                   fromlist=["LOSS_TO_GROUP"]).LOSS_TO_GROUP,
        "expression_loss", "orientation",
    )
    with pytest.raises(ValueError, match="expression_q"):
        ControllerTrainer(config=cfg_for("expression_loss", 8, "expression_q"),
                          init_dirs=False)


@pytest.mark.slow
def test_controller_learns_latent_map(phase1_dir, tmp_path):
    """Phase-2b LEARNS, not just runs: when the attributes DataFrame encodes
    a learnable relationship — the orientation group's w slice is a fixed
    linear map of the orientation control — the controller MLP must FIT it:
    the latent_rec training loss and the held-out eval_latent_rec both
    collapse relative to initialization. The phase-2 analog of the phase-1
    blob-world convergence harness (tools/convergence.py); the reference's
    de-facto check was watching latent_rec fall during real controller
    training (reference controller_trainer.py:292-335 eval loop)."""
    from gan_control_tpu.trainers.controller_trainer import ControllerTrainer

    rng = np.random.default_rng(7)
    n = 512
    A = rng.normal(size=(3, 32)).astype(np.float32) * 0.3
    b = rng.normal(size=(32,)).astype(np.float32) * 0.1
    controls = rng.normal(size=(n, 3)).astype(np.float32)
    w = rng.normal(size=(n, STYLE)).astype(np.float32)
    w[:, 0:32] = controls @ A + b  # the orientation group slice IS f(control)
    df = pd.DataFrame(
        {
            "orientation": list(controls),
            "latents_w": list(w),
        }
    )
    df_path = tmp_path / "learnable_df.pkl"
    df.to_pickle(df_path)

    iters = 600
    cfg = {
        "save_name": "learns",
        # lr_mlp=1.0: the reference's 0.01 equalized-lr scaling is sized for
        # its 800K-iteration schedule; this test checks the MACHINERY learns
        # in 600 iters, so run the MLP at unscaled lr
        "model_config": {"latent_size": STYLE, "size": SIZE, "lr_mlp": 1.0,
                         "n_mlp": 2, "in_dim": 3, "mid_dim": 64,
                         "loss": "orientation_loss"},
        "training_config": {
            "rec_loss": "l1", "generator_dir": str(phase1_dir), "iter": iters,
            "batch": 32, "reg_every": 4, "lr": 0.01,
            "generate_controls": "sampled_df", "sampled_df_path": str(df_path),
            "min_evaluate_interval": 100, "save_nets_interval": 10**9,
            "losses": ["latent_rec"],
        },
    }
    tr = ControllerTrainer(config=cfg, init_dirs=False)
    tr.train(iters)

    hist = tr.metrics_history
    first, last = hist[0], hist[-1]
    # training loss collapses (tiny MLP on an exactly-representable map;
    # reference run on this box: 0.914 -> 0.041 — 0.15 is a robust margin)
    assert last["latent_rec_loss"] < 0.15 * first["latent_rec_loss"], (first, last)
    # ...and GENERALIZES: the held-out 10% split improves just as much
    # (0.742 -> 0.046 in the reference run)
    assert last["eval_latent_rec"] < 0.15 * first["eval_latent_rec"], (first, last)


@pytest.mark.slow
def test_controller_learns_through_frozen_generator(phase1_dir, tmp_path):
    """attribute_rec LEARNS, not just backprops: with a differentiable toy
    predictor (per-channel image mean) and no latent_rec term, the
    controller must steer the FROZEN generator's output statistics toward
    the target controls — the gradient path controller -> w slice ->
    synthesis -> predictor actually optimizes (reference
    controller_trainer.py:231-239). The loss plateaus at the projection
    onto G's achievable set, so the margins assert a robust DECREASE, not
    collapse (measured on this box: train 5.70 -> 1.99, held-out
    4.89 -> 2.33 over 300 iters)."""
    from gan_control_tpu.trainers.controller_trainer import ControllerTrainer

    rng = np.random.default_rng(3)
    n = 256
    controls = rng.normal(size=(n, 3)).astype(np.float32)
    w = rng.normal(size=(n, STYLE)).astype(np.float32)
    df = pd.DataFrame({"orientation": list(controls), "latents_w": list(w)})
    df_path = tmp_path / "attr_learn_df.pkl"
    df.to_pickle(df_path)

    def fake_predict(images):
        return jnp.mean(images, axis=(1, 2)) * 10.0  # (B, 3) channel means

    iters = 400
    cfg = {
        "save_name": "attr_learns",
        "model_config": {"latent_size": STYLE, "size": SIZE, "lr_mlp": 1.0,
                         "n_mlp": 2, "in_dim": 3, "mid_dim": 64,
                         "loss": "orientation_loss"},
        "training_config": {
            "rec_loss": "l1", "generator_dir": str(phase1_dir), "iter": iters,
            "batch": 32, "reg_every": 4, "lr": 0.01,
            "generate_controls": "sampled_df", "sampled_df_path": str(df_path),
            "min_evaluate_interval": 100, "save_nets_interval": 10**9,
            "losses": ["attribute_rec"], "attribute_rec_w": 1.0,
        },
    }
    tr = ControllerTrainer(
        config=cfg, init_dirs=False, predict_fn=fake_predict,
        controller_criterion=lambda p, t: jnp.mean(jnp.abs(p - t)),
    )
    tr.train(iters)

    first, last = tr.metrics_history[0], tr.metrics_history[-1]
    assert last["attribute_loss"] < 0.5 * first["attribute_loss"], (first, last)
    assert last["eval_attribute_loss"] < 0.65 * first["eval_attribute_loss"], (
        first, last)


def test_put_batch_raises_on_indivisible_training_batch():
    """A TRAIN batch that doesn't divide over the mesh must fail loudly —
    the replication fallback is reserved for eval chunks; silently
    replicating a training batch would run the full frozen-G synthesis
    redundantly on every chip (zero data parallelism)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from gan_control_tpu.trainers.controller_trainer import ControllerTrainer

    tr = ControllerTrainer.__new__(ControllerTrainer)
    tr.mesh = Mesh(np.array(jax.devices()[:4]), ("data",))
    tr.batch_sharding = NamedSharding(tr.mesh, P("data"))
    tr.replicated = NamedSharding(tr.mesh, P())

    arr = np.zeros((10, 3), np.float32)  # 10 % 4 != 0
    with pytest.raises(ValueError, match="not divisible"):
        tr._put_batch(arr, train=True)
    # eval batches keep the documented replication fallback
    out = tr._put_batch(arr)
    assert out.shape == (10, 3)
    # and a divisible train batch shards normally
    ok = tr._put_batch(np.zeros((8, 3), np.float32), train=True)
    assert ok.sharding.spec == P("data")
