"""Contrastive disentanglement criterion — pure JAX, static masks.

Behavior contract: LossModelClass.calc_mini_batch_loss + mask builders
(reference losses/loss_model.py:121-202). Given per-layer features of a
mini-batch arranged as [same-group pairs ++ other pairs] (rows 2i, 2i+1 are a
pair), the loss is, per layer:

    dist  = pairwise distance matrix over all rows
    same  = entries for adjacent pairs inside the "same" block
    not_same = all other valid (strictly-lower-triangular) entries
    loss  = mean(clamp(same - lower_thres, 0)) + mean(clamp(upper_thres - not_same, 0))

``focus_on`` per layer flips which side a layer pulls together
(loss_model.py:147-154, 167-174): 'same_as_last_layer' pulls the same-group
pairs under lower_thres and pushes everything else above upper_thres;
'not_same_as_last_layer' does the reverse (used e.g. by the 'other' group's
perceptual layers).

TPU-first: boolean-mask fancy-indexing (dynamic output shapes) is replaced by
``sum(x * mask) / count`` with masks and counts computed host-side from the
static mini-batch arrangement — everything stays static-shaped and jittable.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Pairwise distances (reference: per-criterion __call__ implementations)
# ---------------------------------------------------------------------------


def pairwise_sq_l2(a: jax.Array, b: jax.Array | None = None) -> jax.Array:
    """[N,M] squared-L2 matrix (reference: ArcFaceCriterion, DogFaceCriterion)."""
    b = a if b is None else b
    diff = a[:, None] - b[None, :]
    return jnp.sum(jnp.square(diff), axis=-1)


def pairwise_l1(a: jax.Array, b: jax.Array | None = None) -> jax.Array:
    """[N,M] mean-|diff| over ALL trailing feature axes.

    Covers HopenetCriterion (mean over last two axes), DeepAgeCriterion /
    Face3dmmCriterion (mean over last axis), ESR9Criterion — all are the mean
    absolute difference over every non-batch axis.
    """
    b = a if b is None else b
    diff = a[:, None] - b[None, :]
    axes = tuple(range(2, diff.ndim))
    return jnp.mean(jnp.abs(diff), axis=axes)


def pairwise_mse_gram(a: jax.Array, b: jax.Array | None = None, gain: float = 1e5) -> jax.Array:
    """[N,M] MSE over gram-matrix features x 1e5 (reference: StyleCriterion)."""
    b = a if b is None else b
    diff = a[:, None] - b[None, :]
    axes = tuple(range(2, diff.ndim))
    return jnp.mean(jnp.square(diff), axis=axes) * gain


def pairwise_hair_color(a: jax.Array, b: jax.Array | None = None) -> jax.Array:
    """Hair-color distance (reference: HairCriterion.__call__).

    Features are NHWC [N, H, W, 4]: masked RGB image (3) ++ mask (1). Distance
    is mean-|diff| of per-image mean hair color (remapped to [0,1]), zeroed
    where either image has < 1% hair pixels.
    """
    b = a if b is None else b

    def mean_color_and_valid(f):
        h, w = f.shape[1], f.shape[2]
        masked_img, mask = f[..., :3], f[..., 3:]
        mask_sum = jnp.sum(jax.lax.stop_gradient(mask), axis=(1, 2))  # [N,1]
        valid = mask_sum > 0.01 * h * w
        color = jnp.sum(masked_img, axis=(1, 2)) / (mask_sum + (mask_sum < 0.5))
        return color * 0.5 + 0.5, valid

    ca, va = mean_color_and_valid(a)
    cb, vb = mean_color_and_valid(b)
    valid_uv = va[:, None, 0] & vb[None, :, 0]
    diff = (ca[:, None] - cb[None, :]) * valid_uv[..., None]
    return jnp.mean(jnp.abs(diff), axis=-1)


# ---------------------------------------------------------------------------
# Static masks (reference: loss_model.py:183-202)
# ---------------------------------------------------------------------------


def strict_lower_mask(n: int) -> np.ndarray:
    """Strictly-lower-triangular validity mask (loss_model.py:37)."""
    return np.tril(np.ones((n, n), dtype=bool), k=-1)


def same_pair_mask(num_same_pairs: int, n: int) -> np.ndarray:
    """(2i+1, 2i) entries for pairs in the same-group block (loss_model.py:184-189)."""
    m = np.zeros((n, n), dtype=bool)
    for i in range(num_same_pairs):
        m[2 * i + 1, 2 * i] = True
    return m & strict_lower_mask(n)


def not_same_pair_mask(num_same_pairs: int, num_other_pairs: int, n: int) -> np.ndarray:
    """(2i+1, 2i) entries for the other-group pairs (loss_model.py:191-196)."""
    m = np.zeros((n, n), dtype=bool)
    for i in range(num_same_pairs, num_same_pairs + num_other_pairs):
        m[2 * i + 1, 2 * i] = True
    return m & strict_lower_mask(n)


def _masked_mean(x: jax.Array, mask: np.ndarray) -> jax.Array:
    count = max(int(mask.sum()), 1)
    return jnp.sum(x * jnp.asarray(mask, x.dtype)) / count


# ---------------------------------------------------------------------------
# The criterion
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class ContrastiveConfig:
    """Per-loss contrastive hyper-parameters (one JSON loss block,
    e.g. configs/ffhq.json embedding_loss: weights, thresholds, focus)."""

    intermediate_weights: tuple[float, ...]
    last_layer_weight: float
    lower_thres: tuple[float, ...]
    upper_thres: tuple[float, ...]
    last_lower_thres: float
    last_upper_thres: float
    focus_on: tuple[str, ...]  # len == len(intermediate_weights) + 1
    intermediate_as_last: bool = False  # style_loss: gram criterion everywhere

    @property
    def weights(self) -> tuple[float, ...]:
        return self.intermediate_weights + (self.last_layer_weight,)

    @classmethod
    def from_json(cls, cfg: dict) -> "ContrastiveConfig":
        return cls(
            intermediate_weights=tuple(cfg["intermediate_layers_weights"]),
            last_layer_weight=cfg["last_layer_weight"],
            lower_thres=tuple(cfg["lower_thres"]),
            upper_thres=tuple(cfg["upper_thres"]),
            last_lower_thres=cfg["last_lower_thres"],
            last_upper_thres=cfg["last_upper_thres"],
            focus_on=tuple(cfg["focus_on_list"]),
            intermediate_as_last=bool(cfg.get("intermediate_criterion_as_last_layer", False)),
        )


def contrastive_loss(
    cfg: ContrastiveConfig,
    same_features: Sequence[jax.Array],
    not_same_features: Sequence[jax.Array],
    last_layer_dist: Callable[[jax.Array], jax.Array],
) -> jax.Array:
    """The mini-batch contrastive loss (loss_model.py:121-181).

    Args:
      cfg: thresholds / weights / focus flags.
      same_features: per-layer features of the rows whose even/odd pairs share
        the target group's sub-latent; even length.
      not_same_features: per-layer features of all other rows (their pairs
        share OTHER groups' sub-latents).
      last_layer_dist: f -> [N,N] distance matrix for the final layer (the
        per-predictor criterion); also used for intermediate layers when
        ``cfg.intermediate_as_last``.

    Returns scalar loss.
    """
    n_layers = len(same_features)
    assert len(cfg.weights) == n_layers, (len(cfg.weights), n_layers)

    n_same = same_features[0].shape[0]
    n_not = not_same_features[0].shape[0]
    n = n_same + n_not
    valid = strict_lower_mask(n)
    same_m = same_pair_mask(n_same // 2, n)
    not_same_m = not_same_pair_mask(n_same // 2, n_not // 2, n)

    total = jnp.zeros((), jnp.float32)
    for li in range(n_layers):
        w = cfg.weights[li]
        if w == 0:
            continue
        feats = jnp.concatenate([same_features[li], not_same_features[li]], axis=0)
        is_last = li == n_layers - 1
        if is_last or cfg.intermediate_as_last:
            dist = last_layer_dist(feats)
        else:
            dist = pairwise_l1(feats)
        lo = cfg.last_lower_thres if is_last else cfg.lower_thres[li]
        hi = cfg.last_upper_thres if is_last else cfg.upper_thres[li]

        focus = cfg.focus_on[li]
        if focus == "same_as_last_layer":
            pull_m, push_m = same_m, (~same_m) & valid
        elif focus == "not_same_as_last_layer":
            pull_m, push_m = not_same_m, (~not_same_m) & valid
        else:
            raise ValueError(f"focus_on[{li}] = {focus}")

        pull = _masked_mean(jnp.maximum(dist - lo, 0.0), pull_m)
        push = _masked_mean(jnp.maximum(hi - dist, 0.0), push_m)
        total = total + w * (pull + push)
    return total


def contrastive_loss_masked(
    cfg: ContrastiveConfig,
    features: Sequence[jax.Array],
    last_layer_dist: Callable[[jax.Array], jax.Array],
    same_pairs: jax.Array,
    not_same_pairs: jax.Array,
) -> jax.Array:
    """Mask-driven variant of :func:`contrastive_loss` for the recompile-free
    randomized arrangement (pair masks are ARRAYS fed into the step).

    Semantics are identical: every distance function is symmetric, so the
    reference's reorder-[same ++ rest]-then-strict-lower-triangle bookkeeping
    (loss_model.py:183-202) equals, in original batch order, "each unordered
    row pair counted once" — here the strict-lower validity mask — with the
    group's slot pairs marked at their (odd, even) entries.

    Args:
      features: per-layer [mini_batch, ...] features in BATCH order (no
        same/not-same reordering).
      same_pairs / not_same_pairs: [mini_batch, mini_batch] bool pair masks
        for the target group and for all OTHER groups' pairs.
    """
    n_layers = len(features)
    assert len(cfg.weights) == n_layers, (len(cfg.weights), n_layers)
    n = features[0].shape[0]
    valid = jnp.asarray(strict_lower_mask(n))
    same_pairs = same_pairs & valid
    not_same_pairs = not_same_pairs & valid

    def dyn_masked_mean(x, mask):
        m = mask.astype(x.dtype)
        return jnp.sum(x * m) / jnp.maximum(jnp.sum(m), 1.0)

    total = jnp.zeros((), jnp.float32)
    for li in range(n_layers):
        w = cfg.weights[li]
        if w == 0:
            continue
        is_last = li == n_layers - 1
        if is_last or cfg.intermediate_as_last:
            dist = last_layer_dist(features[li])
        else:
            dist = pairwise_l1(features[li])
        lo = cfg.last_lower_thres if is_last else cfg.lower_thres[li]
        hi = cfg.last_upper_thres if is_last else cfg.upper_thres[li]

        focus = cfg.focus_on[li]
        if focus == "same_as_last_layer":
            pull_m, push_m = same_pairs, valid & ~same_pairs
        elif focus == "not_same_as_last_layer":
            pull_m, push_m = not_same_pairs, valid & ~not_same_pairs
        else:
            raise ValueError(f"focus_on[{li}] = {focus}")

        pull = dyn_masked_mean(jnp.maximum(dist - lo, 0.0), pull_m)
        push = dyn_masked_mean(jnp.maximum(hi - dist, 0.0), push_m)
        total = total + w * (pull + push)
    return total
