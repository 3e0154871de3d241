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
    import jax
    import jax.numpy as jnp

    from gan_control_tpu.losses.registry import build_attr_losses
    from gan_control_tpu.models.factory import (
        build_discriminator, build_generator, build_group_spec)
    from gan_control_tpu.training.state import init_gan_state, make_gan_optimizers
    from gan_control_tpu.training.train_step import TrainStepConfig, make_train_steps
    from gan_control_tpu.utils.config import read_json

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    config = read_json(os.path.join(here, "gan_control_tpu", "configs", "ffhq.json"))
    tc = dict(config["training_config"])
    mc = dict(config["model_config"]); mc["remat"] = True
    if os.environ.get("PROFILE_MP", "0") == "1":
        mc["mixed_precision"] = True
    config = dict(config); config["model_config"] = mc; config["training_config"] = tc

    batch = int(os.environ.get("BENCH_TRAIN_BATCH", tc["batch"]))
    size = mc["size"]
    spec = build_group_spec(config)
    gen = build_generator(config, spec)
    disc = build_discriminator(config)
    g_tx, d_tx = make_gan_optimizers(tc)
    attr_losses, pred_params = build_attr_losses(tc)
    cfg = TrainStepConfig(batch=batch, mini_batch=tc["mini_batch"],
                          style_dim=mc.get("latent_size", 512),
                          remat_predictors=True)

    which = os.environ.get("PROFILE_TRAIN_STEP", "d")  # d | g_adv | g_full
    use_attr = which == "g_full"
    steps = make_train_steps(gen, disc, cfg, spec=spec,
                             attr_losses=attr_losses if use_attr else (),
                             g_tx=g_tx, d_tx=d_tx)
    # donation mirrors bench.py: state buffers are reused across iters
    step = jax.jit(steps["d_step" if which == "d" else "g_step"],
                   donate_argnums=(0,))

    state = init_gan_state(gen, disc, g_tx, d_tx, jax.random.PRNGKey(0),
                           style_dim=cfg.style_dim)
    rng = np.random.default_rng(0)
    real = jnp.asarray(rng.standard_normal((batch, size, size, 3)).astype(np.float32))
    z = jnp.asarray(rng.standard_normal((batch, cfg.style_dim)).astype(np.float32))

    n, warm = 8, 2
    for i in range(n + warm):
        if i == warm:
            t0 = time.perf_counter()
        if which == "d":
            state, m = step(state, real, (z,))
            key = "d_loss"
        else:
            state, m = step(state, (z,), pred_params if use_attr else {})
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
