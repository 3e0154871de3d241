"""Trainer state + optimizer construction.

Reference contract: generator_trainer.py:161-173 — Adam with lazy-
regularization scaling: ``lr * ratio`` and ``betas ** ratio`` where
``ratio = reg_every / (reg_every + 1)`` (StyleGAN2's correction for folding
the regularizer into every Nth step). Reference betas are (0, 0.99).

EMA: accumulate (trainers/utils.py:8-12) with
``decay = 0.5 ** (batch / g_moving_average)`` (generator_trainer.py:332).
"""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import optax


@flax.struct.dataclass
class GANTrainState:
    """The full phase-1 training state — one pytree, donate-able."""

    step: jax.Array  # int32 scalar
    g_params: Any
    d_params: Any
    g_ema: Any
    g_opt_state: Any
    d_opt_state: Any
    mean_path_length: jax.Array  # f32 scalar
    ada_p: jax.Array  # f32 scalar, ADA augment probability
    rng: jax.Array


def reg_adam(lr: float, reg_every: int, b1: float = 0.0, b2: float = 0.99):
    """Adam with the lazy-regularization ratio baked in."""
    ratio = reg_every / (reg_every + 1)
    return optax.adam(lr * ratio, b1=b1**ratio, b2=b2**ratio, eps=1e-8)


def make_gan_optimizers(training_config: dict):
    """(g_tx, d_tx) from the JSON training_config schema (configs/ffhq.json)."""
    g_tx = reg_adam(training_config["lr_g"], training_config["g_reg_every"])
    d_tx = reg_adam(training_config["lr_d"], training_config["d_reg_every"])
    return g_tx, d_tx


def ema_decay(batch: int, g_moving_average: float) -> float:
    return 0.5 ** (batch / g_moving_average)


def ema_update(ema_params, params, decay: float):
    """ema = decay*ema + (1-decay)*params (reference accumulate)."""
    return jax.tree_util.tree_map(
        lambda e, p: e * decay + p.astype(e.dtype) * (1.0 - decay), ema_params, params
    )


def init_gan_state(
    generator,
    discriminator,
    g_tx,
    d_tx,
    rng: jax.Array,
    *,
    init_batch: int = 2,
    style_dim: int = 512,
    image_size: int | None = None,
) -> GANTrainState:
    """Initialize parameters, EMA (= params, reference accumulate(…, 0) at
    generator_trainer.py:159), optimizer states, and carried scalars."""
    size = image_size if image_size is not None else generator.size
    k_g, k_d, k_noise, k_state = jax.random.split(rng, 4)
    z = jnp.zeros((init_batch, style_dim))
    g_vars = generator.init({"params": k_g, "noise": k_noise}, [z])
    d_vars = discriminator.init(
        k_d, jnp.zeros((init_batch, size, size, generator.out_channels))
    )
    # strip weak types: a weak-typed param hardens after its first optimizer
    # update, changing the jit signature and silently recompiling every
    # train step once per weak leaf
    strong = lambda t: jax.tree_util.tree_map(lambda x: x.astype(x.dtype), t)
    g_vars, d_vars = strong(g_vars), strong(d_vars)
    return GANTrainState(
        step=jnp.zeros((), jnp.int32),
        g_params=g_vars,
        d_params=d_vars,
        g_ema=jax.tree_util.tree_map(jnp.copy, g_vars),
        g_opt_state=g_tx.init(g_vars),
        d_opt_state=d_tx.init(d_vars),
        mean_path_length=jnp.zeros((), jnp.float32),
        ada_p=jnp.zeros((), jnp.float32),
        rng=k_state,
    )
