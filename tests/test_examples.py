"""Execute the examples/ walkthroughs end-to-end.

The examples are this framework's form of the reference's documented
tutorial (reference README.md:45 points at
notebooks/gan_control_inference_example.ipynb, stripped from the tree via
.MISSING_LARGE_BLOBS) — run them in the suite so the tutorial cannot rot.
"""

import json
import os
import subprocess
import sys
from pathlib import Path

import pytest

import jax
import jax.numpy as jnp

from gan_control_tpu.models.controller import FcStack
from gan_control_tpu.models.factory import build_generator, build_group_spec
from gan_control_tpu.utils import checkpoint as ckpt_lib
from gan_control_tpu.utils.config import write_json

REPO = Path(__file__).resolve().parent.parent
STYLE = 64
SIZE = 16


@pytest.fixture(scope="module")
def controller_root(tmp_path_factory):
    """The self-contained controller-dir layout (generator/ + <group>_*/)
    with a tiny random model — built directly rather than trained; the
    examples exercise the layout + API contract, not training."""
    root = tmp_path_factory.mktemp("controller_root")
    config = {
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
                "orientation": {"place_in_mini_batch": [0, 4],
                                "place_in_latent": [0, 32]},
                "other": {"place_in_mini_batch": [4, 8],
                          "place_in_latent": [32, 64]},
            },
        },
    }
    gdir = root / "generator"
    gdir.mkdir()
    write_json(config, gdir / "args.json")
    spec = build_group_spec(config)
    gen = build_generator(config, spec)
    params = gen.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        [jnp.zeros((1, STYLE))],
    )
    ckpt_lib.save_checkpoint(gdir / "checkpoint", {"g_ema": params}, 1)

    cdir = root / "orientation_controller"
    cdir.mkdir()
    write_json(
        {"model_config": {"n_mlp": 2, "mid_dim": 32, "in_dim": 3,
                          "lr_mlp": 0.01}},
        cdir / "args.json",
    )
    fc = FcStack(n_mlp=2, mid_dim=32, out_dim=32, lr_mlp=0.01)
    fc_params = fc.init(jax.random.PRNGKey(2), jnp.zeros((1, 3)))
    ckpt_lib.save_checkpoint(cdir / "checkpoint", {"controller": fc_params}, 1)
    return root


def test_inference_example_script(controller_root, tmp_path):
    out = tmp_path / "out"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["JAX_COMPILATION_CACHE_DIR"] = "/tmp/jax_test_cache"
    env["JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"] = "0"
    proc = subprocess.run(
        [sys.executable, str(REPO / "examples" / "inference_example.py"),
         "--controller_dir", str(controller_root),
         "--out", str(out), "--batch", "2"],
        env=env, capture_output=True, text=True, timeout=900,
    )
    assert proc.returncode == 0, (proc.stdout[-1000:], proc.stderr[-3000:])
    names = {p.name for p in out.iterdir()}
    assert "samples.jpg" in names
    assert "controlled.jpg" in names  # orientation controller exists
    assert "interp_orientation.gif" in names
    # tiny config has no predictor loss blocks -> step 4 reports the skip
    assert "step 4 (extract controls) skipped" in proc.stdout


def test_projection_example_script(controller_root, tmp_path):
    """The GAN-inversion walkthrough end-to-end on the tiny model: invert a
    model-generated sample, loss decreases, artifacts land."""
    out = tmp_path / "proj_out"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["JAX_COMPILATION_CACHE_DIR"] = "/tmp/jax_test_cache"
    env["JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"] = "0"
    proc = subprocess.run(
        [sys.executable, str(REPO / "examples" / "projection_example.py"),
         "--model_dir", str(controller_root / "generator"),
         "--out", str(out), "--steps", "60"],
        env=env, capture_output=True, text=True, timeout=900,
    )
    assert proc.returncode == 0, (proc.stdout[-1000:], proc.stderr[-3000:])
    names = {p.name for p in out.iterdir()}
    assert {"target_vs_projection.jpg", "projected_w_plus.npy",
            "history.json"} <= names
    history = json.loads((out / "history.json").read_text())
    assert history[-1]["loss"] < history[0]["loss"], history
    import numpy as np

    w = np.load(out / "projected_w_plus.npy")
    assert w.shape[0] == 1 and w.shape[-1] == STYLE and np.isfinite(w).all()


def test_inference_notebook_cells(controller_root, tmp_path, monkeypatch):
    """Run every code cell of the tutorial notebook in order, headless."""
    nb = json.loads(
        (REPO / "examples" / "gan_control_inference_example.ipynb").read_text()
    )
    assert nb["nbformat"] == 4
    cells = ["".join(c["source"]) for c in nb["cells"]
             if c["cell_type"] == "code"]
    assert len(cells) >= 6

    out = tmp_path / "nb_out"
    monkeypatch.setenv("GANCTL_CONTROLLER_DIR", str(controller_root))
    monkeypatch.setenv("GANCTL_OUT", str(out))
    ns: dict = {}
    for i, src in enumerate(cells):
        exec(compile(src, f"nb_cell_{i}", "exec"), ns)  # noqa: S102

    assert sorted(ns["ctrl"].fc_controls) == ["orientation"]
    names = {p.name for p in out.iterdir()}
    assert {"samples.jpg", "controlled.jpg", "interp_orientation.gif"} <= names


def test_serving_example_script(controller_root, tmp_path):
    """The deployment walkthrough end-to-end on the tiny model: live
    bucketed serving, StableHLO export, model-code-free reload, and the
    in-script live-vs-exported parity assertion."""
    out = tmp_path / "serve_out"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["JAX_COMPILATION_CACHE_DIR"] = "/tmp/jax_test_cache"
    env["JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"] = "0"
    proc = subprocess.run(
        [sys.executable, str(REPO / "examples" / "serving_example.py"),
         "--controller_dir", str(controller_root), "--out", str(out)],
        env=env, capture_output=True, text=True, timeout=900,
    )
    assert proc.returncode == 0, (proc.stdout[-1000:], proc.stderr[-3000:])
    assert "exported path reproduces the live path" in proc.stdout
    names = {p.name for p in out.iterdir()}
    assert "served.jpg" in names
    bins = list((out / "artifacts").glob("*.bin"))
    assert bins and (out / "artifacts" / "manifest.json").exists()
