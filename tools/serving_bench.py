"""A/B the serving dispatch regimes on the real chip.

Measures per-request wall-clock latency (dispatch -> numpy images on host)
of controlled generation through:

  - ``Controller.gen_batch_by_controls`` — the reference-faithful API
    (reference inference/controller.py:29-54): unjitted mapping apply,
    one unjitted FcStack apply per controlled group, host-side noise
    expansion, then the jitted synthesis executable. Every unjitted op is
    its own device dispatch — a tunnel/PCIe round-trip per op.
  - ``ServingController.generate`` — the whole request as ONE jitted
    executable (gan_control_tpu/inference/serving.py), bucket-padded.

A synthetic controller layout at the flagship scale (FFHQ-512 split_fc
generator + random FcStack heads) is built on disk first — latency is
weight-independent. Run on the TPU tunnel (default) or CPU smoke
(``JAX_PLATFORMS=cpu SERVING_BENCH_SIZE=64``). One JSON line per
(path, batch) pair; requests are timed individually after a warmup so the
numbers are honest request latencies, not amortized throughput.

Same-process A/B only (chip microbenchmarks vary across processes).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("GANCTL_LOG_STDERR", "1")  # stdout = JSON lines only

import numpy as np

CONTROL_DIMS = {"orientation": 3, "age": 1, "hair": 3, "gamma": 27}


def build_layout(root: Path, size: int, mixed_precision: bool) -> Path:
    import jax
    import jax.numpy as jnp

    from gan_control_tpu.models.controller import FcStack
    from gan_control_tpu.models.factory import build_generator, build_group_spec
    from gan_control_tpu.utils import checkpoint as ckpt_lib
    from gan_control_tpu.utils.config import read_json, write_json

    here = Path(__file__).resolve().parents[1]
    config = read_json(here / "gan_control_tpu" / "configs" / "ffhq.json")
    config["model_config"]["size"] = size
    config["model_config"]["mixed_precision"] = mixed_precision

    gen_dir = root / "generator"
    gen_dir.mkdir(parents=True)
    write_json(config, gen_dir / "args.json")
    spec = build_group_spec(config)
    gen = build_generator(config, spec)
    style = config["model_config"].get("latent_size", 512)
    params = gen.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        [jnp.zeros((1, style))],
    )
    ckpt_lib.save_checkpoint(gen_dir / "checkpoint", {"g_ema": params}, 1)

    for i, (group, in_dim) in enumerate(CONTROL_DIMS.items()):
        cdir = root / f"{group}_bench"
        cdir.mkdir()
        write_json(
            {"model_config": {"n_mlp": 4, "mid_dim": 512, "in_dim": in_dim,
                              "lr_mlp": 0.01}},
            cdir / "args.json",
        )
        out_dim = spec.group(group).latent_size
        fc = FcStack(n_mlp=4, mid_dim=512, out_dim=out_dim, lr_mlp=0.01)
        fc_params = fc.init(jax.random.PRNGKey(10 + i), jnp.zeros((1, in_dim)))
        ckpt_lib.save_checkpoint(cdir / "checkpoint", {"controller": fc_params}, 1)
    return root


def controls_for(n: int, seed: int = 0) -> dict:
    rng = np.random.default_rng(seed)
    return {g: rng.normal(size=(n, d)).astype(np.float32)
            for g, d in CONTROL_DIMS.items()}


def time_requests(request_fn, n_requests: int) -> dict:
    """Per-request latency: each call runs to numpy on host."""
    lat = []
    for i in range(n_requests):
        t0 = time.perf_counter()
        img = request_fn(i)
        assert isinstance(img, np.ndarray) and img.size
        lat.append(time.perf_counter() - t0)
    lat = np.asarray(lat)
    return {"mean_ms": round(float(lat.mean()) * 1e3, 1),
            "p50_ms": round(float(np.median(lat)) * 1e3, 1),
            "min_ms": round(float(lat.min()) * 1e3, 1)}


def main():
    import jax

    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    on_tpu = jax.devices()[0].platform not in ("cpu",)
    jax.config.update(
        "jax_compilation_cache_dir",
        "/tmp/jax_tpu_cache" if on_tpu else "/tmp/jax_test_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    size = int(os.environ.get("SERVING_BENCH_SIZE", 512 if on_tpu else 64))
    batches = tuple(int(b) for b in
                    os.environ.get("SERVING_BENCH_BATCHES", "1,16").split(","))
    n_requests = int(os.environ.get("SERVING_BENCH_REQUESTS",
                                    10 if on_tpu else 3))

    from gan_control_tpu.inference.controller import Controller
    from gan_control_tpu.inference.serving import ServingController

    with tempfile.TemporaryDirectory(prefix="serving_bench_") as td:
        root = build_layout(Path(td), size, mixed_precision=on_tpu)
        ctrl = Controller(root)
        serve = ServingController(root, buckets=batches)

        key = jax.random.PRNGKey(0)
        for batch in batches:
            controls = controls_for(batch)

            def via_controller(i):
                img, _, _ = ctrl.gen_batch_by_controls(
                    batch_size=batch, rng=jax.random.fold_in(key, i), **controls)
                return np.asarray(img)

            def via_serving(i):
                img, _, _ = serve.generate(
                    batch_size=batch, rng=jax.random.fold_in(key, i), **controls)
                return img

            via_controller(1000)  # compile + warm
            multi = time_requests(via_controller, n_requests)
            via_serving(1000)
            fused = time_requests(via_serving, n_requests)

            speedup = round(multi["p50_ms"] / fused["p50_ms"], 2)
            print(json.dumps({
                "metric": f"serving_latency_{size}px_batch{batch}",
                "unit": "ms/request", "requests": n_requests,
                "multi_dispatch": multi, "fused_one_dispatch": fused,
                "fused_speedup_p50": speedup,
            }))


if __name__ == "__main__":
    main()
