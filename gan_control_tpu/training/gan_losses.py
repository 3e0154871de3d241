"""Core StyleGAN2 losses and regularizers — pure JAX.

Behavior contracts (reference trainers/generator_trainer.py):
  - d_logistic_loss (:690-695): softplus(-real) + softplus(fake), means.
  - g_nonsaturating_loss (:563-566): softplus(-fake).mean().
  - R1 (:697-719): ||d D(x)/d x||^2 summed per sample, meaned over batch.
  - path-length (:601-614): sqrt(mean_L ||dw (G(w)·n)||^2) per sample with
    n ~ N(0, 1/(H·W)); penalty is squared deviation from a running mean.

TPU-first: both regularizers are expressed through jax VJPs inside the
jitted step — the reference's DataParallel-friendly `return_grad` plumbing
(gan_model.py:794-811) is unnecessary under SPMD and is intentionally absent.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def d_logistic_loss(real_pred: jax.Array, fake_pred: jax.Array) -> jax.Array:
    return jax.nn.softplus(-real_pred).mean() + jax.nn.softplus(fake_pred).mean()


def g_nonsaturating_loss(fake_pred: jax.Array) -> jax.Array:
    return jax.nn.softplus(-fake_pred).mean()


def r1_penalty(
    d_real_logit_fn: Callable[[jax.Array], jax.Array], real_img: jax.Array
) -> jax.Array:
    """R1 gradient penalty: per-sample squared grad norm of the real logit.

    ``d_real_logit_fn`` maps images [B,H,W,C] -> logits [B,1] (already closed
    over the discriminator params).
    """
    grad = jax.grad(lambda x: d_real_logit_fn(x).sum())(real_img)
    return jnp.sum(jnp.square(grad).reshape(grad.shape[0], -1), axis=1).mean()


def path_length_penalty(
    synth_fn: Callable[[jax.Array], jax.Array],
    latents: jax.Array,
    rng: jax.Array,
    mean_path_length: jax.Array,
    decay: float = 0.01,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Path-length regularizer (reference g_path_regularize, :601-614).

    Args:
      synth_fn: w+ latents [B, L, 512] -> images [B, H, W, C] (closed over
        generator params; the mapping network is NOT part of this path —
        same as the reference, which differentiates wrt the post-mapping
        `latent`).
      latents: the w+ used to synthesize.
      rng: PRNG for the projection noise.
      mean_path_length: carried scalar running mean (a^2 target).

    Returns (penalty, new_mean_path_length, path_lengths[B]).
    """
    img, vjp_fn = jax.vjp(synth_fn, latents)
    noise = jax.random.normal(rng, img.shape, img.dtype) / jnp.sqrt(
        jnp.asarray(img.shape[1] * img.shape[2], img.dtype)
    )
    (grad,) = vjp_fn(noise)  # d (img·noise).sum() / d latents, [B, L, 512]
    path_lengths = jnp.sqrt(jnp.mean(jnp.sum(jnp.square(grad), axis=2), axis=1))
    new_mean = mean_path_length + decay * (path_lengths.mean() - mean_path_length)
    # the reference does NOT detach path_mean inside the penalty (only the
    # returned carry is detached, g_path_regularize :612-615): the penalty
    # gradient carries the -decay coupling through path_lengths.mean()
    penalty = jnp.mean(jnp.square(path_lengths - new_mean))
    return penalty, jax.lax.stop_gradient(new_mean), path_lengths
