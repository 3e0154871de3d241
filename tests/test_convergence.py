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
