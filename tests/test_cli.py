"""The two training CLI entry points run end-to-end as subprocesses
(reference contract: python train_generator.py / train_controller.py
--config_path <json>). The trainers themselves are covered in-process
(test_trainer.py / test_phase2.py); these pin the argparse -> config ->
trainer wiring and the artifact layout a user actually gets."""

import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def _run(args, cwd=REPO, timeout=540):
    env = dict(os.environ)
    # the axon sitecustomize registers the remote-TPU backend whenever
    # PALLAS_AXON_POOL_IPS is set and then JAX_PLATFORMS=cpu cannot win;
    # dropping the var keeps the child a plain CPU process. 8 virtual
    # devices match the conftest mesh so the compile cache is warm.
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    env["JAX_PLATFORMS"] = "cpu"
    env["GANCTL_COMPILE_CACHE"] = "/tmp/jax_test_cache"
    return subprocess.run(
        [sys.executable, *args], cwd=cwd, env=env, timeout=timeout,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )


def test_train_controller_cli(tmp_path):
    import numpy as np
    import pandas as pd

    from tests.test_phase2 import STYLE, tiny_model_config
    from gan_control_tpu.models.factory import build_generator, build_group_spec
    from gan_control_tpu.utils import checkpoint as ckpt_lib
    from gan_control_tpu.utils.config import write_json

    import jax
    import jax.numpy as jnp

    # a saved phase-1 model dir in the reference layout
    gen_dir = tmp_path / "phase1"
    gen_dir.mkdir()
    model_cfg = tiny_model_config()
    write_json(model_cfg, gen_dir / "args.json")
    spec = build_group_spec(model_cfg)
    gen = build_generator(model_cfg, spec)
    params = gen.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        [jnp.zeros((1, STYLE))],
    )
    ckpt_lib.save_checkpoint(gen_dir / "checkpoint", {"g_ema": params}, 1)

    rng = np.random.default_rng(0)
    df = pd.DataFrame({
        "orientation": [rng.normal(size=3).astype(np.float32) for _ in range(64)],
        "latents_w": [rng.normal(size=STYLE).astype(np.float32) for _ in range(64)],
    })
    df_path = tmp_path / "attributes_df.pkl"
    df.to_pickle(df_path)

    cfg = {
        "save_name": "orientation_ctrl",
        "results_dir": str(tmp_path / "controllers"),
        "model_config": {
            "latent_size": STYLE, "size": 16, "lr_mlp": 0.01, "n_mlp": 2,
            "in_dim": 3, "mid_dim": 32, "loss": "orientation_loss",
        },
        "training_config": {
            "debug": True, "rec_loss": "l1",
            "generator_dir": str(gen_dir),
            "iter": 8, "batch": 16, "reg_every": 4, "lr": 0.002,
            "generate_controls": "sampled_df",
            "sampled_df_path": str(df_path),
            "min_evaluate_interval": 4, "save_nets_interval": 4,
            "losses": ["latent_rec"],
        },
    }
    cfg_path = tmp_path / "ctrl.json"
    cfg_path.write_text(json.dumps(cfg))

    proc = _run(["train_controller.py", "--config_path", str(cfg_path)])
    assert proc.returncode == 0, proc.stdout[-3000:]
    runs = list((tmp_path / "controllers").glob("*/"))
    assert runs, proc.stdout[-2000:]
    # self-contained controller dir: its own ckpts + a generator copy
    assert list((runs[0] / "checkpoint").glob("*.ckpt"))
    assert (runs[0] / "generator" / "args.json").exists()


def test_train_generator_cli(tmp_path):
    from tests.test_trainer import tiny_config

    cfg = tiny_config(tmp_path)
    # vanilla GAN: build_attr_losses must not try to build real predictors
    cfg_path = tmp_path / "tiny.json"
    cfg_path.write_text(json.dumps(cfg))

    proc = _run(["train_generator.py", "--config_path", str(cfg_path),
                 "--iters", "4"])
    assert proc.returncode == 0, proc.stdout[-3000:]

    runs = list((tmp_path / "results").glob("*/"))
    assert runs, proc.stdout[-2000:]
    run = runs[0]
    assert (run / "args.json").exists()
    assert list((run / "checkpoint").glob("*.ckpt")), "no checkpoint written"


def test_make_attributes_df_alignment_flag_validation():
    """Misconfigured alignment flags fail at argparse time, BEFORE any
    model load (a detector or depth net without FAN landmarks can never
    run — make_align_fn would raise the same, but later and uglier)."""
    import subprocess
    import sys

    root = Path(__file__).parent.parent
    for extra in (["--detector", "sfd", "--detector_weights", "x.pth"],
                  ["--depth_weights", "d.pth"]):
        proc = subprocess.run(
            [sys.executable, "make_attributes_df.py", "--model_dir", "/nope",
             "--save_path", "/tmp/x.pkl", "--align_3d"] + extra,
            cwd=root, capture_output=True, text=True, timeout=120,
        )
        assert proc.returncode == 2, (proc.returncode, proc.stderr[-500:])
        assert "require --fan_weights" in proc.stderr
    # detector without its weights
    proc = subprocess.run(
        [sys.executable, "make_attributes_df.py", "--model_dir", "/nope",
         "--save_path", "/tmp/x.pkl", "--align_3d", "--fan_weights", "f.pth",
         "--detector", "sfd"],
        cwd=root, capture_output=True, text=True, timeout=120,
    )
    assert proc.returncode == 2
    assert "requires --detector_weights" in proc.stderr
