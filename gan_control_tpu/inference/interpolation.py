"""Per-group latent interpolation (slerp / linear / sqrt) and gif export.

Behavior contract (reference evaluation/inference_class.py:125-203):
``interpolate_by_group`` walks through random latent waypoints producing two
frame streams — one FREEZING the group's sub-latent (everything else
interpolates) and one interpolating ONLY the group — the visual proof that a
group controls exactly its attribute. slerp per latent segment (:196-203).
Gifs are written with PIL (the reference shells out to ImageMagick)."""

from __future__ import annotations

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from gan_control_tpu.evaluation.generation import to_uint8_grid


def slerp(val: float, low: jax.Array, high: jax.Array) -> jax.Array:
    """Spherical interpolation row-wise (reference slerp :196-203)."""
    low_n = low / jnp.linalg.norm(low, axis=1, keepdims=True)
    high_n = high / jnp.linalg.norm(high, axis=1, keepdims=True)
    omega = jnp.arccos(jnp.clip(jnp.sum(low_n * high_n, axis=1), -1.0, 1.0))
    so = jnp.sin(omega)
    safe = jnp.where(so == 0, 1.0, so)
    w_low = jnp.where(so == 0, 1.0 - val, jnp.sin((1.0 - val) * omega) / safe)
    w_high = jnp.where(so == 0, val, jnp.sin(val * omega) / safe)
    return w_low[:, None] * low + w_high[:, None] * high


def _interp(kind: str, p: float, a: jax.Array, b: jax.Array) -> jax.Array:
    if kind == "linear":
        return (1 - p) * a + p * b
    if kind == "slerp":
        return slerp(p, a, b)
    return np.sqrt(1 - p) * a + np.sqrt(p) * b


def interpolate_by_group(
    model,
    params,
    group_slice: tuple[int, int],
    rng: jax.Array,
    batch: int = 4,
    num_of_intermediate_latents: int = 4,
    pics_per_interpolation: int = 10,
    interpolation: str = "slerp",
    style_dim: int = 512,
):
    """Returns (freeze_group_frames, freeze_not_group_frames): lists of
    [batch,H,W,C] float arrays in [0,1]."""
    s, e = group_slice
    k1, k2, k_noise = jax.random.split(rng, 3)
    z_base = jnp.broadcast_to(
        jax.random.normal(k1, (1, style_dim)), (batch, style_dim)
    )
    waypoints = [
        jax.random.normal(jax.random.fold_in(k2, i), (batch, style_dim))
        for i in range(num_of_intermediate_latents)
    ]

    # ONE injection-noise realization expanded over the batch (the
    # reference expands a single make_noise() draw, inference_class.py
    # :134-135): every column shares identical fine texture, so the frames
    # isolate the interpolated group as the only varying factor
    shapes = getattr(model, "noise_shapes", None)
    noise = None
    if shapes is not None:
        noise = [
            jnp.broadcast_to(
                jax.random.normal(jax.random.fold_in(k_noise, li), (1,) + sh[1:]),
                (batch,) + sh[1:],
            )
            for li, sh in enumerate(shapes(1))
        ]

    @jax.jit
    def _gen(p, z):
        kw = {"noise": noise} if noise is not None else {}
        img, _ = model.apply(p, [z], rngs={"noise": k_noise}, **kw)
        return jnp.clip(img * 0.5 + 0.5, 0.0, 1.0)

    def gen(z):
        return _gen(params, z)

    freeze_group, freeze_not_group = [], []
    z1 = z_base
    for z2 in waypoints:
        for p in np.linspace(0, 1, pics_per_interpolation):
            start = _interp(interpolation, p, z1[:, :s], z2[:, :s])
            end = _interp(interpolation, p, z1[:, e:], z2[:, e:])
            grp = _interp(interpolation, p, z1[:, s:e], z2[:, s:e])
            z_freeze_grp = jnp.concatenate([start, z_base[:, s:e], end], axis=1)
            z_freeze_rest = jnp.concatenate(
                [z_base[:, :s], grp, z_base[:, e:]], axis=1
            )
            freeze_group.append(np.asarray(gen(z_freeze_grp)))
            freeze_not_group.append(np.asarray(gen(z_freeze_rest)))
        z1 = z2
    return freeze_group, freeze_not_group


def save_gif(frames: list[np.ndarray], path: str | Path, nrow: int = 4,
             duration_ms: int = 500):
    """frames: list of [B,H,W,C] in [0,1] -> animated gif of grids."""
    from PIL import Image

    imgs = [Image.fromarray(to_uint8_grid(f, nrow=nrow)) for f in frames]
    imgs[0].save(
        str(path), save_all=True, append_images=imgs[1:], duration=duration_ms, loop=0
    )
