"""calibrate_thresholds.py CLI on synthetic data (VERDICT r1 item 8) —
the TPU port of the reference loss_model.py:323-520 histogram harness."""

import json
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import calibrate_thresholds as ct  # noqa: E402


def test_per_layer_same_not_same_math():
    """Diagonal = same, min-off-diagonal = 2nd best, rest = all_not_same
    (reference calc_same_not_same_list, loss_model.py:204-236)."""
    from gan_control_tpu.losses.contrastive import pairwise_sq_l2

    rng = np.random.default_rng(0)
    feats = rng.normal(size=(12, 4)).astype(np.float32)
    chunks = [[feats[:6]], [feats[6:]]]
    stats = ct.per_layer_same_not_same(chunks, [pairwise_sq_l2], chunk=4)
    assert len(stats) == 1
    s = stats[0]
    sig, qry = feats[::2], feats[1::2]
    d = ((sig[:, None] - qry[None, :]) ** 2).sum(-1)
    np.testing.assert_allclose(s["same"], np.diag(d), rtol=1e-5)
    # per-QUERY 2nd-best: min over signatures (axis 0; reference
    # loss_model.py:218-227)
    off = np.where(np.eye(6, dtype=bool), np.inf, d)
    np.testing.assert_allclose(s["not_same"], off.min(axis=0), rtol=1e-5)
    assert len(s["all_not_same"]) == 30


@pytest.mark.slow
def test_calibrate_cli_synthetic(tmp_path):
    """Full CLI run: synthetic loader + expression_loss (random weights,
    warns loudly) -> histograms + thresholds JSON with suggestions."""
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
    out = tmp_path / "cal"
    rc = ct.main([
        "--config_path", str(cfg_path), "--loss", "expression_loss",
        "--num_images", "8", "--batch_size", "4", "--out", str(out),
    ])
    assert rc == 0
    hists = sorted(out.glob("expression_loss_layer_*.jpg"))
    assert len(hists) == 2  # shared repr + emotions
    table = json.loads((out / "expression_loss_thresholds.json").read_text())
    for layer in table.values():
        sug = layer["suggested"]
        assert np.isfinite(sug["lower_thres"]) and np.isfinite(sug["upper_thres"])
        # hinge geometry: pull target below push target
        assert sug["lower_thres"] <= layer["all_not_same"]["p80"]
