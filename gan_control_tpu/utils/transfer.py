"""Transfer-learning partial parameter load.

Behavior contract (reference gan_model.load_transfer_learning_model
:645-656 + generator_trainer.py:154-157): load a pretrained generator's
weights into a new model, keeping the NEW model's mapping-network ('style')
parameters when they don't match (e.g. switching from a regular to a split
mapping) — but a mismatch OUTSIDE the mapping network means the checkpoint
belongs to a different architecture, and the reference raises ValueError
rather than silently training the synthesis network from scratch."""

from __future__ import annotations

from typing import Any

import jax
import numpy as np

from gan_control_tpu.utils.logging_utils import get_logger

_log = get_logger(__name__)


def _is_mapping_path(path) -> bool:
    return any("style" in str(k) for k in path)


def partial_load(target: Any, source: Any, strict: bool = True) -> Any:
    """Copy every leaf from `source` into `target` where the path exists
    and the shape matches; mapping-network ('style') leaves keep the target
    value on mismatch. With ``strict`` (the reference behavior,
    gan_model.py:649-656) any OTHER missing/mismatched leaf raises —
    silently keeping random synthesis weights would let a wrong-architecture
    checkpoint train from scratch while the user believes transfer learning
    is active. ``strict=False`` restores the permissive keep-target mode."""
    flat_t = jax.tree_util.tree_flatten_with_path(target)[0]
    flat_s = dict(jax.tree_util.tree_flatten_with_path(source)[0])
    kept, loaded = 0, 0
    leaves = []
    for path, t_leaf in flat_t:
        s_leaf = flat_s.get(path)
        if s_leaf is not None and np.shape(s_leaf) == np.shape(t_leaf):
            leaves.append(s_leaf)
            loaded += 1
        else:
            if strict and not _is_mapping_path(path):
                key = "/".join(str(k) for k in path)
                raise ValueError(
                    f"transfer learning: leaf {key!r} is part of the main "
                    f"network but is missing or shape-mismatched in the "
                    f"source checkpoint "
                    f"({np.shape(s_leaf) if s_leaf is not None else 'absent'}"
                    f" vs {np.shape(t_leaf)}) — wrong architecture? "
                    f"(reference gan_model.py:649-656 raises here too; pass "
                    f"strict=False to keep target values instead)"
                )
            leaves.append(t_leaf)
            kept += 1
    _log.info("transfer learning: loaded %d leaves, kept %d", loaded, kept)
    treedef = jax.tree_util.tree_structure(target)
    return jax.tree_util.tree_unflatten(treedef, leaves)
