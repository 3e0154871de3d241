"""The training loop LEARNS — blob-world convergence through the real
GeneratorTrainer (tools/convergence.py).

Every other test asserts mechanics (finiteness, shapes, parity); this one
asserts IMPROVEMENT: the generated distribution approaches the data
(pixel-statistics FID proxy), the D separates real from fake, the
contrastive disentanglement mechanism visibly engages (same-group toy
feature distances collapse relative to not-same), and the EMA generator
tracks — the suite-scale stand-in for the reference's continuous FID /
separability tracking during real training (reference
trainers/generator_trainer.py:728-748, configs/ffhq.json
evaluation_config). The 600-iteration reference run with tighter margins
is committed at tools/results/convergence_run.jsonl.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent.parent))

from tools import convergence


@pytest.mark.slow
@pytest.mark.nightly
def test_blob_world_convergence():
    records = convergence.run(iters=300, eval_every=150, seed=0, out_path=None)
    first, last = records[0], records[-1]

    # (a) learning: the FID proxy collapses (523 -> ~7 at 300 iters in the
    # reference run; 4x is a robust floor), and D tells real from fake
    # better than an untrained D (logistic loss 2*ln2 ~ 1.386)
    assert last["fid_proxy"] < 0.25 * first["fid_proxy"], (first, last)
    assert last["d_loss_recent"] < 2.0 * np.log(2.0), last

    # (b) disentanglement: same-group feature distances shrink RELATIVE to
    # not-same. At init, sharing half the latent correlates everything
    # (ratio ~0.62); trained, each group's ratio collapses (0.34 / 0.29 at
    # 300 iters in the reference run — 0.5 is a robust ceiling)
    assert last["color_ratio"] < 0.5, last
    assert last["position_ratio"] < 0.5, last
    assert last["color_ratio"] < 0.75 * first["color_ratio"], (first, last)
    assert last["position_ratio"] < 0.75 * first["position_ratio"], (first, last)

    # (c) the EMA generator tracks the live one
    assert last["ema_fid_proxy"] < 0.25 * first["ema_fid_proxy"], (first, last)
    assert last["ema_color_ratio"] < 0.55, last
    assert last["ema_position_ratio"] < 0.55, last


def test_committed_run_artifacts_hold_their_verdicts():
    """The committed convergence runs (tools/results/*.jsonl — normal,
    random-arrangement, ADA, and on-chip bf16) are self-consistent and
    still evidence learning: the stored verdict line matches a fresh
    verdict() of the eval records (artifact integrity), every core
    learning boolean holds, and the runs that measured ADA adaptation
    show p moved off 0. The one documented exception: random-arrangement
    color_disentangled is false at the final snapshot (noisier by
    construction — TRAINING.md), so for it the mechanism must instead
    visibly ENGAGE mid-run (min ratio < 0.5x init)."""
    import json
    from pathlib import Path

    results = Path(__file__).parent.parent / "tools" / "results"
    paths = sorted(results.glob("convergence_run*.jsonl"))
    assert len(paths) >= 4, paths  # normal, random, ada, tpu_bf16

    core = ["fid_proxy_improved", "ema_fid_proxy_improved",
            "d_below_untrained", "position_disentangled", "ema_tracks"]
    for path in paths:
        records = [json.loads(l) for l in path.read_text().splitlines()]
        evals = [r for r in records if "iter" in r]
        assert evals[0]["iter"] == 0 and evals[-1]["iter"] >= 600, path
        v = convergence.verdict(evals)
        stored = records[-1]
        assert "iter" not in stored, (path, "missing trailing verdict line")
        for k, x in v.items():
            got = stored.get(k)
            if isinstance(x, bool) or x is None:
                assert got == x, (path, k, got, x)
            else:
                # numeric fields recompute from the ROUNDED jsonl records,
                # so the 4th decimal can differ from the live-run verdict
                assert got is not None and abs(got - x) <= 1e-3, (path, k, got, x)
        for k in core:
            assert v[k] is True, (path, k, v)
        if v["color_disentangled"] is not True:
            assert "random" in path.name, (path, v)
            ratios = [r["color_ratio"] for r in evals]
            # TRAINING.md documents 0.62 -> 0.33-0.46 for this mode
            assert min(ratios) < 0.35 and ratios[-1] < 0.5, (path, ratios)
        if "ada" in path.name:
            assert v.get("ada_adapted") is True, (path, v)
