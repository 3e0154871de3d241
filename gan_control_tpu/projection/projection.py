"""Latent-optimization (GAN inversion) utilities + the projector loop.

Behavior contracts (reference projection/projection.py):
  - noise_regularize (:126-146): multi-scale autocorrelation penalty on the
    injection-noise pyramid (shift-by-1 products, squared, summed across
    downsampled octaves until size 8).
  - get_lr (:157-162): cosine ramp-down with linear warm-up.
  - latent_noise (:165-168): additive exploration noise on w.
  - get_avg_latent (:113-123): mean / std of w over n samples.
  - get_pca_groups (:44-69): per-group PCA of centered w keeping
    components covering 50 % of variance.
  - make_image (:171-182): [-1,1] -> uint8 HWC.
  - project(): the optimization loop (Adam on (w+, noises) with perceptual
    + MSE + noise-reg losses) — jitted update step, TPU-resident."""

from __future__ import annotations

import math
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax


def noise_regularize(noises: Sequence[jax.Array]) -> jax.Array:
    """NHWC noise maps [B,H,W,1]; penalty over octaves down to size 8."""
    loss = jnp.zeros((), jnp.float32)
    for noise in noises:
        size = noise.shape[1]
        n = noise
        while True:
            loss = (
                loss
                + jnp.square(jnp.mean(n * jnp.roll(n, 1, axis=2)))
                + jnp.square(jnp.mean(n * jnp.roll(n, 1, axis=1)))
            )
            if size <= 8:
                break
            b = n.shape[0]
            n = n.reshape(b, size // 2, 2, size // 2, 2, 1).mean(axis=(2, 4))
            size //= 2
    return loss


def noise_normalize(noises: Sequence[jax.Array]) -> list[jax.Array]:
    return [(n - n.mean()) / (n.std() + 1e-8) for n in noises]


def get_lr(t: float, initial_lr: float, rampdown: float = 0.25, rampup: float = 0.05) -> float:
    lr_ramp = min(1.0, (1.0 - t) / rampdown)
    lr_ramp = 0.5 - 0.5 * math.cos(lr_ramp * math.pi)
    lr_ramp = lr_ramp * min(1.0, t / rampup)
    return initial_lr * lr_ramp


def latent_noise(rng: jax.Array, latent: jax.Array, strength) -> jax.Array:
    return latent + jax.random.normal(rng, latent.shape, latent.dtype) * strength


def make_image(tensor: jax.Array) -> np.ndarray:
    """[-1,1] NHWC -> uint8 NHWC."""
    t = np.clip(np.asarray(tensor), -1, 1)
    return ((t + 1) * 127.5).astype(np.uint8)


def get_avg_latent(map_fn: Callable[[jax.Array], jax.Array], rng: jax.Array,
                   n_mean_latent: int = 10000, style_dim: int = 512):
    z = jax.random.normal(rng, (n_mean_latent, style_dim))
    w = map_fn(z)
    mean = w.mean(axis=0)
    std = jnp.sqrt(jnp.sum(jnp.square(w - mean)) / n_mean_latent)
    return mean, std


def get_pca_groups(
    map_fn,
    group_slices: dict[str, tuple[int, int]],
    latent_mean: jax.Array,
    rng: jax.Array,
    n_mean_latent: int = 10000,
    style_dim: int = 512,
    variance_percent: float = 0.5,
) -> dict[str, np.ndarray]:
    """Per-group PCA basis covering `variance_percent` of w variance."""
    z = jax.random.normal(rng, (n_mean_latent, style_dim))
    w = np.asarray(map_fn(z)) - np.asarray(latent_mean)
    out = {}
    for group, (s, e) in group_slices.items():
        gw = w[:, s:e]
        gw = gw - gw.mean(axis=0)
        _, svals, vt = np.linalg.svd(gw, full_matrices=False)
        var = svals**2
        k = int(np.argmax(np.cumsum(var) / var.sum() > variance_percent))
        out[group] = vt[: k + 1]
    return out


def project(
    synth_fn: Callable,
    lpips_fn: Callable[[jax.Array, jax.Array], jax.Array],
    target: jax.Array,
    latent_init: jax.Array,
    noise_shapes: Sequence[tuple],
    rng: jax.Array,
    steps: int = 1000,
    initial_lr: float = 0.1,
    latent_std: float | jax.Array = 1.0,
    noise_strength_base: float = 0.05,
    noise_ramp: float = 0.75,
    noise_regularize_w: float = 1e5,
    mse_weight: float = 0.0,
):
    """Optimize (w+, injection noises) to reconstruct `target` ([-1,1] NHWC).

    synth_fn(latent, noises) -> image. Returns (latent, noises, history).

    ``latent_std``: the w-space std from :func:`get_avg_latent` — the
    reference's exploration noise is latent_std * 0.05 * ramp^2 (its
    projector loop), so pass it for parity; the default 1.0 gives much
    weaker exploration.
    """
    k_n, rng = jax.random.split(rng)
    noises = [
        jax.random.normal(jax.random.fold_in(k_n, i), s) for i, s in enumerate(noise_shapes)
    ]
    params = {"latent": latent_init, "noises": noises}
    # the cosine lr schedule must scale the UPDATE, not the gradient:
    # Adam's m/sqrt(v) is invariant to a (slowly varying) gradient scale,
    # so scaling grads would nullify the ramp (the reference sets
    # param_groups[0]['lr'] = get_lr(t, lr) each step)
    opt = optax.inject_hyperparams(optax.adam)(learning_rate=initial_lr)
    opt_state = opt.init(params)

    @jax.jit
    def step_fn(params, opt_state, lr, noise_strength, key):
        def loss_fn(p):
            latent_n = latent_noise(key, p["latent"], noise_strength)
            img = synth_fn(latent_n, p["noises"])
            if img.shape[1] > 256:
                factor = img.shape[1] // 256
                b, h, w, c = img.shape
                img_s = img.reshape(b, h // factor, factor, w // factor, factor, c).mean((2, 4))
            else:
                img_s = img
            p_loss = jnp.sum(lpips_fn(img_s, target))
            n_loss = noise_regularize(p["noises"])
            mse = jnp.mean(jnp.square(img_s - target))
            total = p_loss + noise_regularize_w * n_loss + mse_weight * mse
            return total, (p_loss, n_loss, mse)

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        opt_state.hyperparams["learning_rate"] = lr
        updates, new_opt = opt.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        new_params["noises"] = noise_normalize(new_params["noises"])
        return new_params, new_opt, loss, aux

    history = []
    for i in range(steps):
        t = i / steps
        lr = get_lr(t, initial_lr)
        noise_strength = (
            latent_std * noise_strength_base * max(0.0, 1.0 - t / noise_ramp) ** 2
        )
        rng, key = jax.random.split(rng)
        params, opt_state, loss, aux = step_fn(
            params, opt_state, lr, noise_strength, key
        )
        if i % 50 == 0:
            history.append(
                {"step": i, "loss": float(loss), "perceptual": float(aux[0]),
                 "noise": float(aux[1]), "mse": float(aux[2])}
            )
    return params["latent"], params["noises"], history
