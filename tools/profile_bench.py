"""Per-phase timing breakdown of the two bench workloads on the real chip.

Usage:  python tools/profile_bench.py [gen|train|both]

Prints wall-clock per dispatch region so optimization work targets the
actual bottleneck instead of guesses. Not part of the driver contract
(bench.py is); this is a developer tool.
"""

from __future__ import annotations

import os
import sys
import time

os.environ.setdefault("GANCTL_LOG_STDERR", "1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _median_time(fn, n=10, warmup=2):
    for _ in range(warmup):
        fn()
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def profile_generation():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import FFHQ_GROUPS
    from gan_control_tpu.latent.groups import GroupSpec
    from gan_control_tpu.models.generator import Generator

    batch = int(os.environ.get("BENCH_BATCH", 128))
    spec = GroupSpec.from_config(FFHQ_GROUPS, mini_batch=16)
    gen = Generator(size=512, style_dim=512, n_mlp=8, split_fc=True,
                    fc_groups=spec.fc_dims(), dtype=jnp.bfloat16)
    z = jax.random.normal(jax.random.PRNGKey(0), (batch, 512))
    params = gen.init({"params": jax.random.PRNGKey(1),
                       "noise": jax.random.PRNGKey(2)}, [z[:1]])
    rng = jax.random.PRNGKey(7)

    # full forward
    @jax.jit
    def full(params, z):
        img, _ = gen.apply(params, [z], rngs={"noise": rng})
        return jnp.sum(img)

    # mapping only
    @jax.jit
    def mapping(params, z):
        w = gen.apply(params, z, method=type(gen).map_latent)
        return jnp.sum(w)

    t_full = _median_time(lambda: float(full(params, z)))
    t_map = _median_time(lambda: float(mapping(params, z)))
    print(f"generation batch={batch}")
    print(f"  full forward : {t_full*1e3:8.2f} ms  ({batch/t_full:8.1f} imgs/s)")
    print(f"  mapping only : {t_map*1e3:8.2f} ms")
    print(f"  synthesis est: {(t_full-t_map)*1e3:8.2f} ms")


def profile_train():
    """One step kind per process (holding several non-donated compiled
    train graphs at once OOMs a 16GB chip). Knobs: PROFILE_TRAIN_STEP in
    {d, g_adv, g_full}; the BENCH_TRAIN_* envs (bench.build_train_harness)
    select precision/remat/batch exactly as bench.py would measure them."""
    import jax

    from bench import build_train_harness

    # bench defaults to mixed precision; the profiler defaults to the f32
    # plan so breakdowns compare against historical numbers unless asked
    os.environ.setdefault("BENCH_TRAIN_MP", "0")
    if os.environ.get("PROFILE_MP") == "1":
        os.environ["BENCH_TRAIN_MP"] = "1"

    which = os.environ.get("PROFILE_TRAIN_STEP", "d")  # d | g_adv | g_full
    h = build_train_harness(on_tpu=True, attr=which == "g_full")
    batch, size = h["batch"], h["size"]
    # donation mirrors bench.py: state buffers are reused across iters
    step = jax.jit(h["steps"]["d_step" if which == "d" else "g_step"],
                   donate_argnums=(0,))
    state, real = h["state"], h["real"]
    z = h["zs"][0]

    n, warm = 8, 2
    for i in range(n + warm):
        if i == warm:
            t0 = time.perf_counter()
        if which == "d":
            state, m = step(state, real, (z,))
            key = "d_loss"
        else:
            state, m = step(state, (z,), h["pred_params"] if which == "g_full" else {})
            key = "g_loss"
        float(m[key])
    dt = (time.perf_counter() - t0) / n
    print(f"train step={which} batch={batch} size={size}: {dt*1e3:8.1f} ms "
          f"({batch/dt:.1f} imgs/s)")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    if which in ("gen", "both"):
        profile_generation()
    if which in ("train", "both"):
        profile_train()
