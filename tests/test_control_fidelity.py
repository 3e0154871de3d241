"""Control-fidelity harness (tools/control_fidelity.py): the product claim
— ``gen_batch_by_controls(group=X)`` produces a measured attribute that
TRACKS X — demonstrated end to end on blob world (VERDICT r4 next-round
item 1; reference inference/controller.py:29-54, make_attributes_df.py).

Two layers: pin the committed full run's verdicts, and re-run a shortened
harness in-suite (nightly: the full pipeline is minutes of CPU)."""

from __future__ import annotations

import json
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent.parent))

ARTIFACT = (
    Path(__file__).parent.parent / "tools" / "results"
    / "control_fidelity.jsonl"
)


def _records():
    return [json.loads(l) for l in ARTIFACT.read_text().splitlines() if l]


def test_committed_run_proves_control():
    """The committed artifact's verdicts: phase-1 healthy, and EVERY
    control dimension's measured attribute rank-correlates >= 0.9 with the
    requested value."""
    records = _records()
    v = records[-1]
    assert v["phase1_disentangled"] is True
    assert v["color_control_monotone"] is True
    assert v["position_control_monotone"] is True
    assert min(v["color_spearman_means"]) >= 0.9
    assert min(v["position_spearman_means"]) >= 0.9

    # the fidelity stage actually swept: measured spans are a real
    # fraction of each sweep's requested range (no flat-response pass)
    fid = next(r for r in records if r.get("stage") == "fidelity")
    for d in range(3):
        assert fid[f"color{d}_measured_span_mean"] > 0.05
    for d in range(2):
        assert fid[f"position{d}_measured_span_mean"] > 0.05


def test_spearman():
    from tools.control_fidelity import spearman

    x = np.arange(10.0)
    assert spearman(x, 2 * x + 1) == pytest.approx(1.0)
    assert spearman(x, -x) == pytest.approx(-1.0)
    # monotone-nonlinear still rank-perfect
    assert spearman(x, np.exp(x / 3)) == pytest.approx(1.0)
    assert abs(spearman(x, np.zeros(10))) < 1e-9


@pytest.mark.slow
@pytest.mark.nightly
def test_control_fidelity_short_run(tmp_path):
    """Shortened end-to-end pipeline in-suite: phase-1 400 iters is enough
    for clear disentanglement (tools/results/convergence_run.jsonl shows
    ratios < 0.5 by iter 300), controllers 800 iters. The fidelity bar is
    relaxed vs the committed run (less training) but still demands real
    monotone control on every dimension.

    Runs as a SUBPROCESS of the CLI: the in-process variant aborted the
    nightly pytest session (the accumulated compiled-executable memory of
    the earlier nightly tests plus this pipeline exceeds the box), and the
    subprocess also exercises the tool's actual entry point."""
    import subprocess
    import sys as _sys

    out = tmp_path / "cf.jsonl"
    proc = subprocess.run(
        [_sys.executable, "tools/control_fidelity.py",
         "--iters", "400", "--ctrl-iters", "800", "--n-samples", "2048",
         "--workdir", str(tmp_path / "wd"), "--out", str(out)],
        cwd=Path(__file__).parent.parent,
        capture_output=True, text=True, timeout=5000,
    )
    assert out.exists(), (proc.returncode, proc.stdout[-2000:],
                          proc.stderr[-2000:])
    records = [json.loads(l) for l in out.read_text().splitlines() if l]
    v = records[-1]
    assert "color_spearman_means" in v, records
    assert v["phase1_disentangled"], records
    assert min(v["color_spearman_means"]) >= 0.6, v
    assert min(v["position_spearman_means"]) >= 0.6, v


def test_spearman_tie_handling():
    from tools.control_fidelity import spearman

    x = np.arange(8.0)
    # ties share an average rank
    y = np.array([0, 0, 1, 1, 2, 2, 3, 3], float)
    assert spearman(x, y) == pytest.approx(0.9759000729485331, abs=1e-6)
    assert spearman(y, y) == pytest.approx(1.0)
