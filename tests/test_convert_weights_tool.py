"""tools/convert_weights.py end-to-end: converts what it finds, reports what
is missing, writes goldens + msgpack, --validate round-trips, and the loss
registry consumes the msgpack output without torch."""

import json
import sys
from pathlib import Path

import numpy as np
import pytest
import torch

import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))

import convert_weights as cw  # noqa: E402

from test_weight_conversion2 import make_torch_vgg16_features  # noqa: E402


def _make_root(tmp_path):
    root = tmp_path / "pretrained_models"
    root.mkdir()
    torch.manual_seed(21)
    feats = make_torch_vgg16_features(31)
    wrapper = torch.nn.Module()
    wrapper.features = feats
    torch.save(wrapper.state_dict(), root / "vgg16-397923af.pth")
    return root


@pytest.mark.slow
def test_convert_tool_end_to_end(tmp_path, capsys):
    root = _make_root(tmp_path)
    rc = cw.main(["--root", str(root)])
    assert rc == 0
    out = capsys.readouterr().out
    # vgg16 found -> style_loss (and lpips backbone needs lin weights, missing)
    assert "converting style_loss" in out
    assert "MISSING" in out and "embedding_loss" in out

    out_dir = root / "converted"
    mp = out_dir / "style_loss.msgpack"
    assert mp.exists()
    goldens = json.loads((out_dir / "goldens.json").read_text())
    assert "style_loss" in goldens
    assert goldens["style_loss"]["source_sha256"]
    assert len(goldens["style_loss"]["golden"]["first8"]) == 8

    # validate passes against the stored goldens
    rc = cw.main(["--root", str(root), "--validate"])
    assert rc == 0
    assert "OK      style_loss" in capsys.readouterr().out

    # corrupt the golden -> validate fails
    goldens["style_loss"]["golden"]["mean"] += 1.0
    (out_dir / "goldens.json").write_text(json.dumps(goldens))
    rc = cw.main(["--root", str(root), "--validate"])
    assert rc == 1


@pytest.mark.slow
def test_registry_loads_msgpack(tmp_path):
    """A config model_path pointing at the tool's .msgpack output loads the
    converted params (bit-identical to on-the-fly torch conversion)."""
    from gan_control_tpu.losses.predictors import vgg_style
    from gan_control_tpu.losses.registry import build_attr_losses

    root = _make_root(tmp_path)
    assert cw.main(["--root", str(root), "--only", "style_loss"]) == 0
    mp = root / "converted" / "style_loss.msgpack"

    tc = {
        "style_loss": {
            "enabled": True,
            "model_path": str(mp),
            "same_group_name": "style",
            "last_layer_weight": 1.0,
            "intermediate_layers_weights": [1.0, 1.0, 1.0],
            "lower_thres": [0.0, 0.0, 0.0],
            "upper_thres": [1.0, 1.0, 1.0],
            "last_lower_thres": 0.0,
            "last_upper_thres": 1.0,
            "focus_on_list": ["same_as_last_layer"] * 4,
            "intermediate_criterion_as_last_layer": True,
        }
    }
    specs, params = build_attr_losses(tc)
    assert len(specs) == 1 and specs[0].name == "style_loss"

    model = vgg_style.make_model({"center_crop": None})
    direct = vgg_style.convert_torch_weights(model, str(root / "vgg16-397923af.pth"))
    loaded_leaf = params["style_loss"]["params"]["conv0"]["weight"]
    direct_leaf = direct["params"]["conv0"]["weight"]
    np.testing.assert_array_equal(np.asarray(loaded_leaf), np.asarray(direct_leaf))

    # and the loaded params drive the feature fn
    img = jnp.zeros((2, 64, 64, 3))
    feats = specs[0].feature_fn(params["style_loss"], img)
    assert feats[-1].shape[0] == 2


def test_verify_sha_pins_and_manifest(tmp_path, capsys):
    """--verify-sha: filename-pinned checkpoints are enforced (our fake
    vgg16 fails its published pin), unpinned ones are recorded into
    sha256s.json and enforced against the recording on the next run."""
    root = _make_root(tmp_path)
    # an unpinned checkpoint: hopenet
    (root / "hopenet_robust_alpha1.pkl").write_bytes(b"fake-hopenet-weights")

    rc = cw.main(["--root", str(root), "--verify-sha"])
    out = capsys.readouterr().out
    assert rc == 1  # fake vgg16 violates its 397923af pin
    assert "MISMATCH style_loss" in out
    assert "OK      orientation_loss" in out and "[recorded]" in out

    manifest = json.loads((root / "converted" / "sha256s.json").read_text())
    assert "orientation_loss" in manifest
    assert len(manifest["orientation_loss"]["sha256"]) == 64
    assert "style_loss" not in manifest  # mismatches are not recorded

    # tamper with the recorded file -> second run flags it
    (root / "hopenet_robust_alpha1.pkl").write_bytes(b"tampered")
    rc = cw.main(["--root", str(root), "--verify-sha"])
    out = capsys.readouterr().out
    assert rc == 1
    assert "MISMATCH orientation_loss" in out
