"""Sample-grid and per-group matrix generation.

Behavior contract (reference evaluation/generation.py):
  - gen_grid (:14-22): generate from fixed latents, [-1,1] -> [0,1] grid.
  - make_noise_id_pose_matrix + gen_matrix (:25-94): an R x C image matrix
    where every image in a row shares one group's sub-latent ("ids") and
    every image in a column shares the complement ("poses") — the visual
    disentanglement check saved per group during training
    (generator_trainer.py:774-850).

TPU-first: the whole matrix is ONE batched forward (R*C rows) instead of
the reference's per-image loop."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def to_uint8_grid(images: np.ndarray, nrow: int = 4, pad: int = 2) -> np.ndarray:
    """[N,H,W,C] in [0,1] -> one [H',W',C] uint8 grid image."""
    images = np.asarray(images)
    n, h, w, c = images.shape
    ncol = nrow
    nrows = -(-n // ncol)
    grid = np.zeros((nrows * (h + pad) + pad, ncol * (w + pad) + pad, c), np.float32)
    for i in range(n):
        r, cl = divmod(i, ncol)
        grid[
            pad + r * (h + pad) : pad + r * (h + pad) + h,
            pad + cl * (w + pad) : pad + cl * (w + pad) + w,
        ] = images[i]
    return (np.clip(grid, 0, 1) * 255).astype(np.uint8)


def save_image_grid(images, path, nrow: int = 4):
    from PIL import Image

    Image.fromarray(to_uint8_grid(np.asarray(images), nrow=nrow)).save(path)


def gen_grid_images(model, params, latent, rng=None, noise=None):
    """Generate [0,1] images from z latents (reference gen_grid core)."""
    rng = jax.random.PRNGKey(0) if rng is None else rng
    img, _ = model.apply(params, [latent], noise=noise, rngs={"noise": rng})
    return jnp.clip(img * 0.5 + 0.5, 0.0, 1.0)


def make_matrix_latents(
    rng: jax.Array,
    ids_in_row: int = 6,
    pose_in_col: int = 6,
    style_dim: int = 512,
    same_chunk: tuple[int, int] = (256, 512),
) -> jax.Array:
    """[R*C, style_dim] z where row r shares z[same_chunk] and column c
    shares the complement (reference make_noise_id_pose_matrix :25-48)."""
    s, e = same_chunk
    ids = jax.random.normal(rng, (pose_in_col, style_dim))  # per-ROW chunk donors
    poses = jax.random.normal(
        jax.random.fold_in(rng, 1), (ids_in_row, style_dim)
    )  # per-COLUMN complement donors
    rows = []
    for r in range(pose_in_col):
        for c in range(ids_in_row):
            rows.append(poses[c].at[s:e].set(ids[r][s:e]))
    return jnp.stack(rows, axis=0)


def gen_matrix_images(
    model,
    params,
    rng: jax.Array,
    ids_in_row: int = 6,
    pose_in_col: int = 6,
    same_chunk: tuple[int, int] = (256, 512),
    style_dim: int = 512,
):
    """[0,1] images of the disentanglement matrix, one batched forward."""
    k_lat, k_noise = jax.random.split(rng)
    latents = make_matrix_latents(k_lat, ids_in_row, pose_in_col, style_dim, same_chunk)
    img, _ = model.apply(params, [latents], rngs={"noise": k_noise})
    return jnp.clip(img * 0.5 + 0.5, 0.0, 1.0)
