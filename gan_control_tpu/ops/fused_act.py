"""Fused bias + LeakyReLU + gain.

Semantics contract (reference: models/gan_model.py:25-41):
``scale * leaky_relu(x + bias)`` with ``negative_slope=0.2`` and
``scale=sqrt(2)``; the bias broadcasts over every axis except channels.

On TPU this is a pure VPU elementwise chain; XLA fuses it into the producing
convolution, so a hand-written kernel would only add dispatch overhead. The
function exists as a named op so model code reads like the math and so a
Pallas variant can be slotted in behind the same signature if profiling ever
shows a fusion break.
"""

from __future__ import annotations

import math

import jax


def fused_leaky_relu(
    x: jax.Array,
    bias: jax.Array | None = None,
    negative_slope: float = 0.2,
    scale: float = math.sqrt(2.0),
) -> jax.Array:
    """``scale * leaky_relu(x + bias)`` with channel-last bias broadcast.

    Works for both activation maps [N, H, W, C] and dense features [N, C]:
    the bias is broadcast against the trailing (channel) axis, the NHWC
    mirror of the reference's channel-axis-1 broadcast
    (models/gan_model.py:39-41).
    """
    if bias is not None:
        x = x + bias.astype(x.dtype)
    return scale * jax.nn.leaky_relu(x, negative_slope=negative_slope)


def scaled_leaky_relu(x: jax.Array, negative_slope: float = 0.2) -> jax.Array:
    """Bias-free variant (reference: ScaledLeakyReLU, models/gan_model.py:205-214)."""
    return math.sqrt(2.0) * jax.nn.leaky_relu(x, negative_slope=negative_slope)
