"""upfirdn2d — upsample, pad, FIR filter, downsample. NHWC, TPU-first.

Semantics contract (reference: models/pytorch_upfirdn2d.py:9-50, wrapped at
models/gan_model.py:45-50):

    1. zero-stuff each pixel with (up-1) trailing zeros along H and W
       (output length ``in * up``)
    2. zero-pad by (pad0, pad1) per axis; negative pads crop
    3. convolve (true convolution, i.e. correlate with the flipped kernel)
       with a 2-D FIR filter, "valid"
    4. keep every ``down``-th sample starting at 0

Instead of translating those five tensor reshapes, the whole pipeline is
expressed as ONE ``lax.conv_general_dilated``:

    - ``lhs_dilation=(up, up)`` performs the zero-stuffing inside the conv
      (XLA inserts no actual zeros in memory),
    - conv padding carries pad0/pad1 — XLA supports *negative* padding, so
      the crop case needs no separate slice,
    - ``window_strides=(down, down)`` performs the decimation,
    - the kernel is pre-flipped so XLA's correlation computes a convolution.

One subtlety: lhs_dilation produces length ``(in-1)*up + 1`` (no trailing
zeros after the last sample) while the reference zero-stuffing produces
``in*up``; the difference of ``up-1`` trailing zeros is folded into the
high-side padding.

The filter is applied depthwise (same 2-D kernel for every channel) via
``feature_group_count=C``. XLA lowers this to a TPU convolution; for the
small 4-tap binomial kernels used by StyleGAN2 the op is HBM-bandwidth bound
and fuses with neighbors.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def make_kernel(k) -> jnp.ndarray:
    """Normalized 2-D FIR kernel from a 1-D or 2-D tap list.

    Reference behavior: models/gan_model.py:60-68 (outer product of 1-D taps,
    normalized to sum 1).
    """
    k = jnp.asarray(k, dtype=jnp.float32)
    if k.ndim == 1:
        k = k[None, :] * k[:, None]
    return k / jnp.sum(k)


@functools.partial(jax.jit, static_argnames=("up", "down", "pad"))
def upfirdn2d(
    x: jax.Array,
    kernel: jax.Array,
    up: int = 1,
    down: int = 1,
    pad: tuple[int, int] = (0, 0),
) -> jax.Array:
    """Upsample-FIR-downsample on an NHWC tensor.

    Args:
      x: [N, H, W, C] input.
      kernel: [kh, kw] FIR filter (not flipped; true convolution applied).
      up / down: integer resampling factors (same for H and W, matching the
        reference wrapper at models/gan_model.py:45-50).
      pad: (pad0, pad1) applied to both H and W; may be negative.

    Returns:
      [N, H_out, W_out, C] with
      ``H_out = (H*up + pad0 + pad1 - kh) // down + 1``.
    """
    return _upfirdn2d_xla(x, kernel, (up, up), (down, down), (pad[0], pad[1], pad[0], pad[1]))


def upfirdn2d_native(
    x: jax.Array,
    kernel: jax.Array,
    up: tuple[int, int],
    down: tuple[int, int],
    pad: tuple[int, int, int, int],
) -> jax.Array:
    """Full-signature upfirdn (separate x/y factors, 4-way padding).

    ``pad`` is (pad_x0, pad_x1, pad_y0, pad_y1) to match the reference
    signature (models/pytorch_upfirdn2d.py:9).
    """
    return _upfirdn2d_xla(x, kernel, (up[0], up[1]), (down[0], down[1]), pad)


def _upfirdn2d_xla(x, kernel, up_xy, down_xy, pad_xyxy):
    up_x, up_y = up_xy
    down_x, down_y = down_xy
    pad_x0, pad_x1, pad_y0, pad_y1 = pad_xyxy

    n, h, w, c = x.shape
    kh, kw = kernel.shape

    # True convolution == correlation with the flipped kernel.
    k = jnp.flip(kernel, (0, 1)).astype(jnp.float32)
    # Depthwise: one [kh, kw, 1, 1] filter shared across C groups.
    k = jnp.tile(k[:, :, None, None], (1, 1, 1, c))  # HWIO with I=1, O=C

    # lhs_dilation yields (h-1)*up+1 samples; the reference zero-stuffing
    # yields h*up. Add the missing (up-1) trailing zeros to the high pad.
    pad_h = (pad_y0, pad_y1 + up_y - 1)
    pad_w = (pad_x0, pad_x1 + up_x - 1)

    compute_dtype = x.dtype
    out = lax.conv_general_dilated(
        x,
        k.astype(compute_dtype),
        window_strides=(down_y, down_x),
        padding=(pad_h, pad_w),
        lhs_dilation=(up_y, up_x),
        rhs_dilation=(1, 1),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )
    return out


# ---------------------------------------------------------------------------
# FIR wrappers (reference: models/gan_model.py:71-129). Pure functions; the
# pad arithmetic is a static property of (kernel length, factor), so it is
# computed in Python at trace time.
# ---------------------------------------------------------------------------


_DEFAULT_TAPS = (1.0, 3.0, 3.0, 1.0)


def _pallas_blur_wanted(
    kernel: jax.Array, factor: int, x: jax.Array, direction: str = "up"
) -> bool:
    import os

    if not (
        os.environ.get("GANCTL_PALLAS", "0") == "1"
        and factor == 2
        and getattr(kernel, "ndim", 0) == 2
        and kernel.shape == (4, 4)
        and not isinstance(kernel, jax.core.Tracer)
    ):
        return False
    from gan_control_tpu.ops.pallas_kernels import blur_fits_vmem

    n, h, w, c = x.shape
    if not blur_fits_vmem(h, w, c, x.dtype.itemsize, direction):
        return False  # per-program block would exceed scoped VMEM; lax tiles
    want = np.outer(_DEFAULT_TAPS, _DEFAULT_TAPS)
    want = want / want.sum()
    return bool(np.allclose(np.asarray(kernel, np.float32), want, atol=1e-6))


def upsample_2x(x: jax.Array, kernel: jax.Array, factor: int = 2) -> jax.Array:
    """FIR 2x upsampling: gain-compensated kernel, up=factor.

    Reference behavior: Upsample module, models/gan_model.py:71-89.
    `kernel` is the normalized FIR filter from :func:`make_kernel`.
    With GANCTL_PALLAS=1 the separable 4-tap case runs the fused Pallas
    kernel (ops/pallas_kernels.py)."""
    if _pallas_blur_wanted(kernel, factor, x, "up"):
        from gan_control_tpu.ops.pallas_kernels import blur2x_up

        return blur2x_up(x, _DEFAULT_TAPS)
    klen = kernel.shape[0]
    p = klen - factor
    pad0 = (p + 1) // 2 + factor - 1
    pad1 = p // 2
    return upfirdn2d(x, kernel * (factor**2), up=factor, down=1, pad=(pad0, pad1))


def downsample_2x(x: jax.Array, kernel: jax.Array, factor: int = 2) -> jax.Array:
    """FIR 2x downsampling (reference: Downsample, models/gan_model.py:92-110)."""
    if _pallas_blur_wanted(kernel, factor, x, "down"):
        from gan_control_tpu.ops.pallas_kernels import blur2x_down

        return blur2x_down(x, _DEFAULT_TAPS)
    klen = kernel.shape[0]
    p = klen - factor
    pad0 = (p + 1) // 2
    pad1 = p // 2
    return upfirdn2d(x, kernel, up=1, down=factor, pad=(pad0, pad1))


def _separable_taps(kernel) -> tuple[np.ndarray, np.ndarray] | None:
    """(row_taps, col_taps) if the concrete 2-D kernel is rank-1 (an outer
    product, e.g. every make_kernel(1-D taps) output); None otherwise.
    Trace-time only — returns None for tracers."""
    if isinstance(kernel, jax.core.Tracer) or getattr(kernel, "ndim", 0) != 2:
        return None
    a = np.asarray(kernel, np.float64)
    if max(a.shape) > 8:
        return None
    u, s, vt = np.linalg.svd(a)
    if len(s) > 1 and s[1] > 1e-6 * max(s[0], 1e-30):
        return None
    return u[:, 0] * np.sqrt(s[0]), vt[0] * np.sqrt(s[0])


def _blur_separable(x, row_taps, col_taps, pad):
    """Separable FIR as shifted-slice multiply-adds (one VPU fusion per
    axis). Alternate to the depthwise ``lax.conv`` for the no-resample
    blur, available behind GANCTL_PALLAS=1: an early cross-process
    measurement suggested the densified conv was ~100x off roofline, but
    the controlled SAME-process A/B (tools/blur_roofline_bench.py; the
    tunneled chip varies 2-4x across processes) showed the conv
    best-or-tied at every bf16 D-pyramid shape (18.0 ms pyramid total vs
    23.8 for this form), so the conv stays the default. The taps are
    flipped here, so this computes the same TRUE convolution as
    :func:`upfirdn2d`."""
    pad0, pad1 = pad
    xp = jnp.pad(x, ((0, 0), (pad0, pad1), (pad0, pad1), (0, 0)))
    rt = np.asarray(row_taps, np.float64)[::-1]
    ct = np.asarray(col_taps, np.float64)[::-1]
    h_out = xp.shape[1] - len(rt) + 1
    w_out = xp.shape[2] - len(ct) + 1
    t = None
    for i, tap in enumerate(rt):
        term = xp[:, i : i + h_out, :, :] * jnp.asarray(tap, x.dtype)
        t = term if t is None else t + term
    y = None
    for j, tap in enumerate(ct):
        term = t[:, :, j : j + w_out, :] * jnp.asarray(tap, x.dtype)
        y = term if y is None else y + term
    return y


def blur(
    x: jax.Array,
    kernel: jax.Array,
    pad: tuple[int, int],
    upsample_factor: int = 1,
) -> jax.Array:
    """FIR blur with explicit padding (reference: Blur, models/gan_model.py:113-129).

    Default path is the one-conv :func:`upfirdn2d` form — the measured
    winner on v5e (see the dispatch comment below). Under GANCTL_PALLAS=1,
    separable kernels with non-negative pads take the shifted-slice MAC
    path or the Mosaic kernel instead (:func:`_blur_separable`,
    ops/pallas_kernels.py) for re-tuning on other hardware."""
    if upsample_factor > 1:
        kernel = kernel * (upsample_factor**2)
    # Default = the one-conv lax path. Three implementations were A/B'd on
    # the real v5e at every batch-16 512px D-pyramid shape
    # (tools/blur_roofline_bench.py): the depthwise conv, the XLA
    # shifted-slice MAC form, and the manual-DMA Mosaic kernel. In the
    # controlled same-process run the conv is best-or-tied at every bf16
    # shape (pyramid totals 18.0 / 23.8 / 17.7 ms) and wins the large f32
    # shapes; run-to-run variance across processes on the tunneled chip is
    # 2-4x, so only same-process comparisons were trusted. The alternates
    # stay available behind GANCTL_PALLAS=1 for re-tuning on other
    # hardware (ops/pallas_kernels.py module docstring has the table).
    import os

    if os.environ.get("GANCTL_PALLAS", "0") == "1" and min(pad) >= 0:
        sep = _separable_taps(kernel)
        if sep is not None:
            klen = len(sep[0])
            # Mosaic kernel needs lane-aligned channels (c%128: HBM memref
            # slice constraint) and pads<=klen-1 (backward pads stay
            # non-negative)
            if (
                jax.default_backend() == "tpu"
                and max(pad) <= klen - 1
                and x.shape[-1] % 128 == 0
            ):
                from gan_control_tpu.ops.pallas_kernels import blur_sep

                rt = tuple(float(v) for v in sep[0][::-1])  # corr taps
                ct = tuple(float(v) for v in sep[1][::-1])
                return blur_sep(x, rt, ct, (pad[0], pad[1]))
            return _blur_separable(x, sep[0], sep[1], pad)
    return upfirdn2d(x, kernel, up=1, down=1, pad=pad)


def blur_pad_upsample(kernel_len: int, conv_kernel_size: int, factor: int = 2):
    """Blur padding used after the transposed conv in the modulated upsample
    path (reference: ModulatedConv2d.__init__, models/gan_model.py:243-249)."""
    p = (kernel_len - factor) - (conv_kernel_size - 1)
    pad0 = (p + 1) // 2 + factor - 1
    pad1 = p // 2 + 1
    return pad0, pad1


def blur_pad_downsample(kernel_len: int, conv_kernel_size: int, factor: int = 2):
    """Blur padding before the strided conv in the modulated downsample path
    (reference: models/gan_model.py:251-257; also ConvLayer :857-866)."""
    p = (kernel_len - factor) + (conv_kernel_size - 1)
    pad0 = (p + 1) // 2
    pad1 = p // 2
    return pad0, pad1
