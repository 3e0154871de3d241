"""Pretrained-weight loading shared by every converted-checkpoint consumer.

One dispatch rule (predictor registry, FID inception, detectors, LPIPS):
a ``.msgpack`` file produced by ``tools/convert_weights.py`` restores
directly with no torch dependency; any other existing path goes through the
net's own ``convert_torch_weights``; a missing path returns None so the
caller can decide between warn-with-random (training predictors) and skip
(FID)."""

from __future__ import annotations

import os
from typing import Any, Callable


def load_pretrained(
    path: str | None, convert_fn: Callable[[str], Any] | None
) -> Any | None:
    """Returns a params pytree, or None when ``path`` is absent/unloadable."""
    if not path or not os.path.exists(path):
        return None
    if path.endswith(".msgpack"):
        import flax.serialization

        with open(path, "rb") as f:
            return flax.serialization.msgpack_restore(f.read())
    if convert_fn is None:
        return None
    return convert_fn(path)
