"""Benchmark harness — prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline metric (BASELINE.md): single-chip 512x512 generation throughput.
Baseline target: 200 imgs/sec/chip (driver BASELINE.json north star).

The flagship model is the FFHQ-512 disentangled generator (split_fc mapping,
7 latent groups). Weights are randomly initialized — throughput is
weight-independent. Activations run in bfloat16 (TPU MXU native); parameters
stay float32.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def main():
    import os

    import jax
    import jax.numpy as jnp

    from __graft_entry__ import FFHQ_GROUPS
    from gan_control_tpu.latent.groups import GroupSpec
    from gan_control_tpu.models.generator import Generator

    platform = jax.devices()[0].platform
    on_tpu = platform not in ("cpu",)
    batch = int(os.environ.get("BENCH_BATCH", 128 if on_tpu else 2))
    size = 512 if on_tpu else 64
    dtype = jnp.bfloat16 if on_tpu else jnp.float32

    spec = GroupSpec.from_config(FFHQ_GROUPS, mini_batch=16)
    gen = Generator(size=size, style_dim=512, n_mlp=8, split_fc=True,
                    fc_groups=spec.fc_dims(), dtype=dtype)
    z = jax.random.normal(jax.random.PRNGKey(0), (batch, 512))
    params = gen.init({"params": jax.random.PRNGKey(1),
                       "noise": jax.random.PRNGKey(2)}, [z[:1]])

    @jax.jit
    def generate(params, z, rng):
        img, _ = gen.apply(params, [z], rngs={"noise": rng})
        # scalar reduction: fetching it forces full device completion even
        # on remote-tunnel backends where block_until_ready is unreliable
        return jnp.sum(img)

    # compile + warmup
    keys = [jax.random.PRNGKey(100 + i) for i in range(24)]
    float(generate(params, z, keys[0]))

    n_iters = 20 if on_tpu else 3
    times = []
    for i in range(n_iters):
        t0 = time.perf_counter()
        float(generate(params, z, keys[i % len(keys)]))
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))

    imgs_per_sec = batch / dt
    baseline = 200.0  # imgs/sec/chip target from BASELINE.md
    result = {
        "metric": f"generation_{size}px_imgs_per_sec_per_chip",
        "value": round(imgs_per_sec, 2),
        "unit": "imgs/sec",
        "vs_baseline": round(imgs_per_sec / baseline, 3),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    import os

    try:
        main()
    except Exception:
        # robustness for smaller chips: retry at a quarter of the batch
        if "BENCH_BATCH" not in os.environ:
            os.environ["BENCH_BATCH"] = "32"
            main()
        else:
            raise
