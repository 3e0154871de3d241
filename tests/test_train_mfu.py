"""tools/train_mfu.py — MFU accounting tool contract.

The real measurement runs on the TPU (table in TRAINING.md "Measured MFU /
roofline"); here the harness builder is stubbed with tiny jittable steps so
the tool's lower/compile/cost-analysis flow, the donated state threading
(the real chip OOM'd when the rep loop accumulated non-donated output
states), and the scalar-fetch sync are exercised on CPU."""

from __future__ import annotations

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent.parent))


def _stub_harness(on_tpu=False):
    from types import SimpleNamespace

    calls = {"n": 0}

    def make_step(key):
        def step(state, *args):
            calls["n"] += 1
            new = {k: v + 1.0 for k, v in state.items()}
            return new, {key: jnp.sum(new["w"])}

        return step

    state = {"w": jnp.zeros((4, 4), jnp.float32)}
    return {
        "steps": {
            "d_step": make_step("d_loss"),
            "g_step": make_step("g_loss"),
            "d_reg_step": make_step("d_r1_loss"),
            "g_reg_step": make_step("g_path_loss"),
        },
        "state": state,
        "pred_params": {},
        "real": jnp.zeros((4, 4, 4, 3), jnp.float32),
        "zs": [jnp.zeros((4, 8), jnp.float32) for _ in range(3)],
        "cfg": SimpleNamespace(d_reg_every=16, g_reg_every=4, path_batch_shrink=2),
        "batch": 4,
    }


def test_train_mfu_measure_flow(monkeypatch, capsys):
    import bench
    from tools import train_mfu

    monkeypatch.setattr(bench, "build_train_harness", _stub_harness)
    monkeypatch.setattr(sys, "argv", ["train_mfu.py", "--measure"])
    train_mfu.main()
    out = capsys.readouterr().out
    # one line per executable with cost analysis + measured timing...
    for name in ("d_step", "g_step", "d_reg_step", "g_reg_step"):
        assert name in out, out
    assert out.count("measured=") == 4, out
    assert out.count("MFU=") == 4, out
    # ...and the cadence-amortized summary with a finite imgs/s
    assert "cadence-amortized" in out, out
    imgs = float(out.rsplit("(", 1)[1].split(" imgs/s")[0])
    assert np.isfinite(imgs) and imgs > 0


@pytest.mark.slow
@pytest.mark.nightly
def test_mfu_gen_exe_flow(monkeypatch, capsys):
    """--exe gen: the generation executable's cost analysis + measurement
    (the serving-side roofline, VERDICT r4 item 7) on the CPU-scale model."""
    from tools import train_mfu

    monkeypatch.setattr(sys, "argv", ["train_mfu.py", "--measure", "--exe", "gen"])
    train_mfu.main()
    out = capsys.readouterr().out
    assert "generation" in out
    assert "measured=" in out and "limiter=" in out


@pytest.mark.slow
@pytest.mark.nightly
def test_mfu_phase2b_exe_flow(monkeypatch, capsys):
    """--exe phase2b: the controller attribute_rec step (FcStack + frozen
    G + frozen Hopenet) lowers, compiles and measures."""
    from tools import train_mfu

    monkeypatch.setattr(
        sys, "argv", ["train_mfu.py", "--measure", "--exe", "phase2b"]
    )
    train_mfu.main()
    out = capsys.readouterr().out
    assert "phase2b_attr_rec_step" in out
    assert "measured=" in out and "limiter=" in out
