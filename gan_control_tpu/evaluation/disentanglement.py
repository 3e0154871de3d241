"""Disentanglement score (DS).

Behavior contract (reference evaluation/extract_recon_3d/ — semantics; the
published file has stale imports, SURVEY.md §0): for a target attribute i,
generate sets of images where every latent group EXCEPT i is frozen per set
(u_j fixed, u_i varies); measure each predictor-attribute's spread within a
set (mean all-vs-all L2 distance, calc_vectors_mean_and_std,
extract_recon_3d.py:11-29), normalize by the attribute's spread over free
sampling (the 'FFHQ std'), and average over sets. DS_i is high when varying
u_i moves attribute i a lot while every OTHER attribute barely moves.

TPU-first: sets are generated in batched forwards directly from latents
(the reference round-trips through per-set image folders on disk)."""

from __future__ import annotations

from typing import Callable, Mapping

import jax
import jax.numpy as jnp
import numpy as np


def all_vs_all_mean_distance(vecs: np.ndarray) -> float:
    """Mean pairwise L2 distance, strictly-lower-triangular entries
    (reference calc_vectors_mean_and_std, all_vs_all=True)."""
    vecs = np.asarray(vecs, np.float64)
    d2 = np.sum((vecs[:, None] - vecs[None, :]) ** 2, axis=-1)
    d = np.sqrt(np.maximum(d2, 0))
    mask = np.tril(np.ones(len(vecs), dtype=bool), -1)
    return float(d[mask].mean())


def disentanglement_scores(
    generate_fn: Callable[[jax.Array], jax.Array],
    attribute_fns: Mapping[str, Callable[[jax.Array], np.ndarray]],
    group_slices: Mapping[str, tuple[int, int]],
    rng: jax.Array,
    num_sets: int = 10,
    set_size: int = 20,
    style_dim: int = 512,
    baseline: Mapping[str, float] | None = None,
) -> dict[str, dict[str, float]]:
    """Returns {varied_group: {attribute: normalized spread sigma}}.

    generate_fn: z -> images [-1,1]; attribute_fns: images -> [B,D] values.
    ``baseline``: per-attribute normalizers. The REFERENCE normalizes by
    the attribute's spread over REAL FFHQ images (ffhq_std_df,
    disentanglement_score.py:66-68) — pass those for paper-comparable
    numbers. With None, the generator's own free-sampling spread is used
    as a proxy; NOTE this can mask coverage deficits (a generator that
    under-covers an attribute shrinks its own baseline). Compose the
    per-group sigmas into the paper's DS_i with :func:`ds_index`.
    """
    if baseline is None:
        # proxy: free-sampling spread of THIS generator
        k_base, rng = jax.random.split(rng)
        z_free = jax.random.normal(k_base, (set_size * 2, style_dim))
        imgs = generate_fn(z_free)
        baseline = {
            name: all_vs_all_mean_distance(fn(imgs)) or 1.0
            for name, fn in attribute_fns.items()
        }

    results: dict[str, dict[str, float]] = {}
    for group, (s, e) in group_slices.items():
        spreads = {name: [] for name in attribute_fns}
        for j in range(num_sets):
            rng, k_fix, k_var = jax.random.split(rng, 3)
            base = jax.random.normal(k_fix, (style_dim,))
            varied = jax.random.normal(k_var, (set_size, e - s))
            z = jnp.broadcast_to(base, (set_size, style_dim))
            z = z.at[:, s:e].set(varied)
            imgs = generate_fn(z)
            for name, fn in attribute_fns.items():
                spreads[name].append(all_vs_all_mean_distance(fn(imgs)))
        results[group] = {
            name: float(np.mean(v) / baseline[name]) for name, v in spreads.items()
        }
    return results


def ds_index(group_sigmas: Mapping[str, float], own_attribute: str) -> float:
    """DS_i = prod over every OTHER attribute of sigma_own / sigma_attr
    (reference disentanglement_score.py:72-79): high when varying group i
    moves its own attribute much more than every other attribute."""
    own = group_sigmas[own_attribute]
    ds = 1.0
    for name, sigma in group_sigmas.items():
        if name == own_attribute:
            continue
        ds *= own / sigma
    return float(ds)
