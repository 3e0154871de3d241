"""Separability evaluation: how well a latent group's sub-space controls
its attribute, measured as the distance gap between same-group pairs and
everything else in a predictor's embedding space.

Behavior contract (reference evaluation/separability.py +
LossModelClass.calc_same_not_same_list, losses/loss_model.py:204-285):
  - sample N latents, copy the group chunk even -> odd rows, generate;
  - per predictor layer: signatures = even-row features, queries = odd-row
    features; distances via the predictor criterion;
  - 'same' = matched-pair distances (diagonal), 'not_same' = PER-QUERY
    2nd-best (minimum non-matching distance over signatures — reference
    loss_model.py:218-227 iterates qid and mins over axis 0), 'all_not_same'
    = all non-matching distances."""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def make_paired_latents(
    rng: jax.Array, n: int, same_chunk: tuple[int, int], style_dim: int = 512
) -> jax.Array:
    s, e = same_chunk
    z = jax.random.normal(rng, (n, style_dim))
    return z.at[1::2, s:e].set(z[0::2, s:e])


def separability_stats(dist_matrix: np.ndarray) -> dict[str, np.ndarray]:
    """dist_matrix[i, j] = d(signature_i, query_j); pair i <-> i."""
    d = np.asarray(dist_matrix)
    n = d.shape[0]
    same = np.diag(d).copy()
    off = np.where(np.eye(n, dtype=bool), np.inf, d)
    # per QUERY: min over signatures (axis 0) — the matrix is asymmetric
    # (signatures and queries are different images), and the reference
    # takes np.min(all_distances[not_same_row_mask, qid]) per qid
    not_same_2nd_best = off.min(axis=0)
    mask = ~np.eye(n, dtype=bool)
    return {
        "same": same,
        "not_same": not_same_2nd_best,
        "all_not_same": d[mask],
    }


def closest_impostor_pairs(dist_matrix: np.ndarray, k: int = 8) -> np.ndarray:
    """[k, 2] (signature_idx, query_idx) rows: the k NOT-SAME pairs with the
    SMALLEST 2nd-best distance — different-identity pairs that collapsed
    together, the failure cases the reference saves as 'bucket' images
    (get_kmin over pids_2nd_best_pairs_df, tracker.py:303-311)."""
    d = np.asarray(dist_matrix)
    off = np.where(np.eye(d.shape[0], dtype=bool), np.inf, d)
    second = off.min(axis=0)
    sig = off.argmin(axis=0)
    k = min(k, d.shape[0])
    order = np.argsort(second)[:k]
    return np.stack([sig[order], order], axis=1)


def calc_separability(
    generate_fn: Callable[[jax.Array], jax.Array],
    feature_fn: Callable[[jax.Array], Sequence[jax.Array]],
    dist_fn: Callable[[jax.Array, jax.Array], jax.Array],
    rng: jax.Array,
    num_of_samples: int = 2000,
    batch_size: int = 20,
    same_chunk: tuple[int, int] = (256, 512),
    style_dim: int = 512,
    last_layer_only: bool = True,
    return_latents: bool = False,
):
    """Returns per-layer {'same', 'not_same', 'all_not_same', 'worst_pairs'}
    (worst_pairs = [k,2] (signature, query) indices of the closest
    impostor pairs, the reference's "bucket" failure cases,
    tracker.py:303-311).

    With ``return_latents`` also returns the paired latents so the caller
    can regenerate the worst pairs' images.

    generate_fn: (z [B,style_dim], rng) -> images [-1,1] NHWC — a FRESH
    injection-noise key per batch, like the reference's per-image noise.
    feature_fn: images -> per-layer feature list.
    dist_fn: (signatures, queries) -> [N,M] distance matrix (the criterion).
    """
    k_lat, k_gen = jax.random.split(rng)
    latents = make_paired_latents(k_lat, num_of_samples, same_chunk, style_dim)

    feats: list[list[np.ndarray]] = []
    for i in range(0, num_of_samples, batch_size):
        imgs = generate_fn(latents[i : i + batch_size],
                           jax.random.fold_in(k_gen, i))
        fl = feature_fn(imgs)
        if last_layer_only:
            fl = [fl[-1]]
        batch_feats = [np.asarray(f) for f in fl]
        if not feats:
            feats = [[bf] for bf in batch_feats]
        else:
            for j, bf in enumerate(batch_feats):
                feats[j].append(bf)
    layers = [np.concatenate(chunks, axis=0) for chunks in feats]

    results = []
    for layer in layers:
        sig = jnp.asarray(layer[0::2])
        qry = jnp.asarray(layer[1::2])
        d = np.asarray(dist_fn(sig, qry))
        st = separability_stats(d)
        st["worst_pairs"] = closest_impostor_pairs(d)
        results.append(st)
    if return_latents:
        return results, latents
    return results
