"""Contrastive-criterion parity vs a numpy oracle of the reference math
(losses/loss_model.py:121-202) and mask gold-values."""

import numpy as np
import pytest

import jax.numpy as jnp

from gan_control_tpu.losses.contrastive import (
    ContrastiveConfig,
    contrastive_loss,
    not_same_pair_mask,
    pairwise_l1,
    pairwise_sq_l2,
    same_pair_mask,
    strict_lower_mask,
)


def oracle_loss(cfg, same_feats, not_same_feats, last_dist_fn):
    """Direct transcription of the reference algorithm in numpy."""
    n_same = same_feats[0].shape[0]
    n_not = not_same_feats[0].shape[0]
    n = n_same + n_not
    valid = np.tril(np.ones((n, n), bool), k=-1)
    same_m = np.zeros((n, n), bool)
    for i in range(n_same // 2):
        same_m[2 * i + 1, 2 * i] = True
    same_m &= valid
    not_m = np.zeros((n, n), bool)
    for i in range(n_same // 2, n_same // 2 + n_not // 2):
        not_m[2 * i + 1, 2 * i] = True
    not_m &= valid

    total = 0.0
    weights = list(cfg.intermediate_weights) + [cfg.last_layer_weight]
    for li in range(len(same_feats)):
        if weights[li] == 0:
            continue
        f = np.concatenate([same_feats[li], not_same_feats[li]], axis=0)
        is_last = li == len(same_feats) - 1
        if is_last or cfg.intermediate_as_last:
            dist = last_dist_fn(f)
        else:
            diff = f[:, None] - f[None, :]
            dist = np.abs(diff).mean(axis=tuple(range(2, diff.ndim)))
        lo = cfg.last_lower_thres if is_last else cfg.lower_thres[li]
        hi = cfg.last_upper_thres if is_last else cfg.upper_thres[li]
        if cfg.focus_on[li] == "same_as_last_layer":
            pull = dist[same_m]
            push = dist[(~same_m) & valid]
        else:
            pull = dist[not_m]
            push = dist[(~not_m) & valid]
        total += weights[li] * (
            np.clip(pull - lo, 0, None).mean() + np.clip(hi - push, 0, None).mean()
        )
    return total


def test_masks_gold():
    # mini-batch of 8 = 2 same pairs + 2 other pairs
    v = strict_lower_mask(8)
    s = same_pair_mask(2, 8)
    ns = not_same_pair_mask(2, 2, 8)
    assert s.sum() == 2 and s[1, 0] and s[3, 2]
    assert ns.sum() == 2 and ns[5, 4] and ns[7, 6]
    assert not (s & ns).any()
    assert (s | ns).sum() == 4
    assert v.sum() == 8 * 7 // 2


@pytest.mark.parametrize("focus", ["same_as_last_layer", "not_same_as_last_layer"])
def test_contrastive_parity_vs_oracle(focus):
    rng = np.random.default_rng(0)
    n_same, n_not = 4, 4
    # 2 intermediate layers (spatial features) + last layer (embedding)
    same_feats = [
        rng.normal(size=(n_same, 6, 5, 3)).astype(np.float32),
        rng.normal(size=(n_same, 3, 3, 2)).astype(np.float32),
        rng.normal(size=(n_same, 16)).astype(np.float32),
    ]
    not_feats = [
        rng.normal(size=(n_not, 6, 5, 3)).astype(np.float32),
        rng.normal(size=(n_not, 3, 3, 2)).astype(np.float32),
        rng.normal(size=(n_not, 16)).astype(np.float32),
    ]
    cfg = ContrastiveConfig(
        intermediate_weights=(0.5, 0.0),
        last_layer_weight=2.0,
        lower_thres=(0.1, 0.2),
        upper_thres=(0.8, 0.9),
        last_lower_thres=1.0,
        last_upper_thres=20.0,
        focus_on=(focus, focus, "same_as_last_layer"),
    )

    def np_sq_l2(f):
        d = f[:, None] - f[None, :]
        return np.square(d).sum(-1)

    want = oracle_loss(cfg, same_feats, not_feats, np_sq_l2)
    got = contrastive_loss(
        cfg,
        [jnp.asarray(f) for f in same_feats],
        [jnp.asarray(f) for f in not_feats],
        pairwise_sq_l2,
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5)


def test_pairwise_l1_matches_reference_reductions():
    rng = np.random.default_rng(1)
    # Hopenet-style [N, 3, 66] features: reference reduces mean over (-2,-1)
    f = rng.normal(size=(5, 3, 66)).astype(np.float32)
    d = np.abs(f[:, None] - f[None, :]).mean(axis=(-2, -1))
    np.testing.assert_allclose(np.asarray(pairwise_l1(jnp.asarray(f))), d, rtol=1e-6)
    # symmetric, zero diagonal
    got = np.asarray(pairwise_l1(jnp.asarray(f)))
    np.testing.assert_allclose(got, got.T, rtol=1e-6)
    np.testing.assert_allclose(np.diag(got), 0, atol=1e-7)
