"""tools/precision_drift.py — the bf16-vs-f32 threshold-drift tool.

The real six-loss drift table lives in WEIGHTS.md (measured on the v5e,
where GANCTL_PREDICTOR_PRECISION changes the conv accumulation mode);
here the tool's full flow — two calibrate_thresholds runs on identical
synthetic images, table diffing, drift emission — executes as a tiny CPU
smoke (on CPU both precision legs are numerically identical, which the
drift column must then report as exactly 0)."""

from __future__ import annotations

import json
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))

import precision_drift  # noqa: E402


@pytest.mark.slow
def test_precision_drift_cpu_smoke(tmp_path, capsys):
    cfg = {
        "model_config": {"size": 96, "latent_size": 64},
        "data_config": {"data_set_name": "synthetic", "path": ""},
        "training_config": {
            "expression_loss": {
                "enabled": True,
                "model_path": "",
                "center_crop": None,
                "same_group_name": "expression",
                "last_layer_weight": 1.0,
                "intermediate_layers_weights": [0.0],
                "lower_thres": [0.0],
                "upper_thres": [1.0],
                "last_lower_thres": 0.1,
                "last_upper_thres": 1.0,
                "focus_on_list": ["same_as_last_layer", "same_as_last_layer"],
            },
        },
    }
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps(cfg))
    rc = precision_drift.main([
        "--config_path", str(cfg_path), "--loss", "expression_loss",
        "--num_images", "8", "--batch_size", "4",
        "--out", str(tmp_path / "drift"),
    ])
    assert rc == 0
    stdout = capsys.readouterr().out
    assert "expression_loss: suggested-threshold drift" in stdout
    # both precision legs wrote their tables
    for prec in ("default", "highest"):
        table = json.loads(
            (tmp_path / "drift" / prec /
             "expression_loss_thresholds.json").read_text()
        )
        assert table
    # on CPU the matmul-precision knob is inert -> identical tables,
    # and every printed drift row must be exactly 0.000%
    drift_rows = [l for l in stdout.splitlines()
                  if l.strip().endswith("%") and "drift %" not in l]
    assert drift_rows
    assert all("0.000%" in row for row in drift_rows), stdout

@pytest.mark.slow
def test_precision_drift_storage_leg(tmp_path, capsys):
    """--storage adds the bf16-battery (predictor_dtype=bfloat16) column.
    Unlike the matmul-precision knob, STORAGE rounding is real on CPU too,
    so the third leg must produce a table (values may legitimately differ)."""
    cfg = {
        "model_config": {"size": 96, "latent_size": 64},
        "data_config": {"data_set_name": "synthetic", "path": ""},
        "training_config": {
            "expression_loss": {
                "enabled": True,
                "model_path": "",
                "center_crop": None,
                "same_group_name": "expression",
                "last_layer_weight": 1.0,
                "intermediate_layers_weights": [0.0],
                "lower_thres": [0.0],
                "upper_thres": [1.0],
                "last_lower_thres": 0.1,
                "last_upper_thres": 1.0,
                "focus_on_list": ["same_as_last_layer", "same_as_last_layer"],
            },
        },
    }
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps(cfg))
    rc = precision_drift.main([
        "--config_path", str(cfg_path), "--loss", "expression_loss",
        "--num_images", "8", "--batch_size", "4",
        "--out", str(tmp_path / "drift"), "--storage",
    ])
    assert rc == 0
    stdout = capsys.readouterr().out
    assert "bf16-store" in stdout
    table = json.loads(
        (tmp_path / "drift" / "default-bfloat16" /
         "expression_loss_thresholds.json").read_text()
    )
    assert table
