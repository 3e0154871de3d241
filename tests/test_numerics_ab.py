"""tools/numerics_ab.py — bf16-vs-f32 trajectory A/B tool.

The real measurement runs on the TPU (table in TRAINING.md "Numerics
status"); here the harness builder is stubbed so the tool's cadence loop,
metric bookkeeping, and JSON contract are exercised without compiling the
512² train graphs.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path
from types import SimpleNamespace

import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).parent.parent))


def _stub_harness(mixed: bool):
    """Deterministic fake step fns; bf16 run offset by a tiny rounding-scale
    delta so the first-iteration relative delta is nonzero but small."""
    eps = 2e-3 if mixed else 0.0
    counter = {"i": 0}

    def step(key):
        def fn(state, *a, **k):
            counter["i"] += 1
            return state, {key: jnp.asarray(1.0 + 0.01 * counter["i"] + eps)}
        return fn

    def g_reg(state, *a, **k):
        counter["i"] += 1
        return state, {"g_path_loss": jnp.asarray(0.5 + eps),
                       "g_mean_path_length": jnp.asarray(1.0)}

    cfg = SimpleNamespace(d_reg_every=16, g_reg_every=4, path_batch_shrink=2)
    return {
        "steps": {"d_step": step("d_loss"), "g_step": step("g_loss"),
                  "d_reg_step": step("d_r1_loss"), "g_reg_step": g_reg},
        "state": {}, "pred_params": {},
        "real": jnp.zeros((4, 8, 8, 3)),
        "zs": [jnp.zeros((4, 8)) for _ in range(4)],
        "cfg": cfg, "batch": 4, "size": 8,
    }


def test_numerics_ab_report(monkeypatch, capsys):
    import bench
    from tools import numerics_ab

    monkeypatch.setattr(bench, "build_train_harness",
                        lambda on_tpu: _stub_harness(
                            __import__("os").environ["BENCH_TRAIN_MP"] == "1"))
    # jax.jit on the python stubs would fail (dict state is fine, but the
    # closures mutate a counter) — run them eagerly
    monkeypatch.setattr(numerics_ab, "METRICS", numerics_ab.METRICS)
    import jax
    monkeypatch.setattr(jax, "jit", lambda fn, **kw: fn)

    monkeypatch.setattr(sys, "argv", ["numerics_ab.py", "--iters", "6"])
    rc = numerics_ab.main()
    assert rc == 0

    lines = [json.loads(l) for l in capsys.readouterr().out.splitlines()]
    verdict = lines[-1]
    assert verdict["verdict"] == "finite"
    per_metric = {l["metric"]: l for l in lines[:-1]}
    assert set(per_metric) == {"d_loss", "g_loss", "d_r1_loss", "g_path_loss"}
    for m, row in per_metric.items():
        assert row["finite"] is True
        # stub injects a 2e-3-scale offset on the bf16 side only
        assert 0 < row["first_iter_rel_delta"] < 0.01, (m, row)
