"""Transfer-learning partial parameter load.

Behavior contract (reference gan_model.load_transfer_learning_model
:645-656 + generator_trainer.py:154-157): load a pretrained generator's
weights into a new model, keeping the NEW model's mapping-network ('style')
parameters when they don't match (e.g. switching from a regular to a split
mapping) and any other shape-mismatched leaves."""

from __future__ import annotations

from typing import Any

import jax
import numpy as np

from gan_control_tpu.utils.logging_utils import get_logger

_log = get_logger(__name__)


def partial_load(target: Any, source: Any) -> Any:
    """Copy every leaf from `source` into `target` where the path exists
    and the shape matches; everything else keeps the target value."""
    flat_t = dict(jax.tree_util.tree_flatten_with_path(target)[0])
    flat_s = dict(jax.tree_util.tree_flatten_with_path(source)[0])
    kept, loaded = 0, 0
    out = {}
    for path, t_leaf in flat_t.items():
        s_leaf = flat_s.get(path)
        if s_leaf is not None and np.shape(s_leaf) == np.shape(t_leaf):
            out[path] = s_leaf
            loaded += 1
        else:
            out[path] = t_leaf
            kept += 1
    _log.info("transfer learning: loaded %d leaves, kept %d", loaded, kept)
    treedef = jax.tree_util.tree_structure(target)
    paths_in_order = [p for p, _ in jax.tree_util.tree_flatten_with_path(target)[0]]
    return jax.tree_util.tree_unflatten(treedef, [out[p] for p in paths_in_order])
