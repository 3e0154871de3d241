"""Pallas TPU kernels for the StyleGAN2 hot ops.

The reference designs for fused CUDA kernels it never shipped
(models/gan_model.py:19-23, README.md:88-89). Here the same primitives are
real TPU kernels:

  - ``fused_bias_act``: scale * leaky_relu(x + bias) on NHWC tiles — one
    VPU pass. XLA usually fuses this into the producing conv already; the
    kernel exists for when profiling shows a fusion break and as the
    swap-in point behind ``ops.fused_act``.
  - ``blur2x_up`` / ``blur2x_down``: the 4-tap binomial FIR resampling
    (the Blur/Upsample/Downsample workhorses) exploiting separability:
    one kernel does the H-pass into VMEM scratch and the W-pass out,
    reading HBM once instead of twice — the op is bandwidth-bound, so
    halving HBM traffic is the win the reference expected from its CUDA
    upfirdn2d.

Selection: the FIR wrappers in ``ops.upfirdn2d`` pick the Pallas path when
``GANCTL_PALLAS=1``; the lax implementations stay the reference semantics
and the parity oracle.

Measured guidance (v5e): the generator's remaining standalone blur is the
ToRGB skip upsample with C=3 — a 3/128-lane workload where the NHWC layout
leaves the VPU almost idle and XLA's conv path wins; the flag therefore
defaults OFF. The big resampling win is elsewhere: the modulated up/down
convs fold their FIR into the conv kernel itself (ops/modulated_conv.py),
which removed the hot-path blurs entirely.

D-pyramid blur A/B (tools/blur_roofline_bench.py, batch-16 512px D
shapes on the real chip, 30-run pipelined means, one controlled
same-process run — cross-process variance on the tunneled chip is 2-4x,
so only same-process numbers were trusted):

    pyramid totals   conv (lax)   sepMAC (XLA slices)   blur_sep (Mosaic)
    bf16             18.0 ms      23.8 ms               17.7 ms
    f32              23.5 ms      40.9 ms               18.4 ms

The depthwise conv is best-or-tied at every bf16 shape and at the large
f32 shapes (peaks 35% of HBM roofline; the <=32px shapes sit on a
~1.5 ms dispatch floor the fused step graph doesn't pay), so the conv
stays the default; GANCTL_PALLAS=1 selects blur_sep (c%128 shapes) /
sepMAC for re-tuning on other hardware. Stubbing every D blur out of the
fused train graphs bounded the whole prize at ~45 ms of the d_step +
~16 ms of the g_step (step timings vary across processes; the canonical
per-executable table lives in TRAINING.md "Measured MFU / roofline") —
most of it intrinsic at these rooflines. The standing guidance: Pallas
blurs are the high-PRECISION option (4.3e-7 vs lax's 9.4e-3), not a
throughput one.

Precision (measured on v5e vs a float64 oracle, tools/pallas_tpu_smoke.py):
the Mosaic kernels do TRUE f32 VPU arithmetic — max err 4.3e-7 — while the
lax conv path inherits the TPU conv unit's default bf16-multiply precision
(max err 9.4e-3 up / 3.0e-3 down). Where exact-f32 resampling matters,
the Pallas path is the accurate one, not just the fused one.
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    # interpret mode on non-TPU backends (tests run on CPU)
    return jax.default_backend() != "tpu"


# ---------------------------------------------------------------------------
# fused bias + leaky relu
# ---------------------------------------------------------------------------


def _bias_act_kernel(x_ref, b_ref, o_ref, *, negative_slope, scale):
    x = x_ref[...]
    y = x + b_ref[...]
    o_ref[...] = scale * jnp.where(y >= 0, y, negative_slope * y)


def fused_bias_act(
    x: jax.Array,
    bias: jax.Array,
    negative_slope: float = 0.2,
    scale: float = math.sqrt(2.0),
) -> jax.Array:
    """scale * leaky_relu(x + bias); bias broadcasts on the last axis.

    x: [..., C]; processed as [rows, C] blocks.
    """
    shape = x.shape
    c = shape[-1]
    rows = int(np.prod(shape[:-1]))
    x2 = x.reshape(rows, c)
    block_rows = min(rows, 256)
    grid = (pl.cdiv(rows, block_rows),)
    out = pl.pallas_call(
        functools.partial(
            _bias_act_kernel, negative_slope=negative_slope, scale=scale
        ),
        out_shape=jax.ShapeDtypeStruct((rows, c), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_rows, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (block_rows, c), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        interpret=_interpret(),
    )(x2, bias.astype(x.dtype).reshape(1, c))
    return out.reshape(shape)


# ---------------------------------------------------------------------------
# separable 4-tap FIR 2x up / down (the Blur workhorse)
# ---------------------------------------------------------------------------


def _blur_down_kernel(p00_ref, p01_ref, p10_ref, p11_ref, o_ref, *, taps,
                      h_out, w_out):
    """Polyphase 2x FIR downsample on PRE-DEINTERLEAVED input phases.

    out[u, v] = sum_{i,j in 0..3} taps[i]*taps[j] * xp[2u+i, 2v+j]
    With the four phase planes P_ab = xp[a::2, b::2] (deinterleaved in XLA
    — Mosaic cannot lower stride-2 vector slices), term (i, j) is the
    STATIC slice P_{i%2, j%2}[u + i//2, v + j//2]: 16 shifted
    multiply-accumulates, no strided access, no transposes.

    Phase blocks: [1, (H+2)/2, (W+2)/2, C]; output [1, h_out, w_out, C].
    """
    refs = ((p00_ref, p01_ref), (p10_ref, p11_ref))
    acc = None
    for i in range(4):
        for j in range(4):
            v = refs[i % 2][j % 2][
                0, i // 2 : i // 2 + h_out, j // 2 : j // 2 + w_out, :
            ]
            term = (taps[i] * taps[j]) * v
            acc = term if acc is None else acc + term
    o_ref[0] = acc


def blur2x_down(x: jax.Array, kernel_1d) -> jax.Array:
    """FIR 2x downsample with a separable 4-tap kernel (NHWC).

    Matches ``downsample_2x(x, make_kernel(k))``: pad (1,1), correlate with
    the 4x4 outer-product kernel, keep every 2nd sample."""
    k = np.asarray(kernel_1d, np.float64)
    k = k / k.sum()
    taps = tuple(float(v) for v in k[::-1])  # correlation with flipped kernel
    n, h, w, c = x.shape
    h_out, w_out = h // 2, w // 2
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    # deinterleave even/odd rows x cols in XLA (one strided-gather pass)
    phases = [xp[:, a::2, b::2, :] for a in (0, 1) for b in (0, 1)]
    hp, wp = (h + 2) // 2, (w + 2) // 2
    phase_spec = pl.BlockSpec(
        (1, hp, wp, c), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        functools.partial(_blur_down_kernel, taps=taps, h_out=h_out, w_out=w_out),
        out_shape=jax.ShapeDtypeStruct((n, h_out, w_out, c), x.dtype),
        grid=(n,),
        in_specs=[phase_spec] * 4,
        out_specs=pl.BlockSpec(
            (1, h_out, w_out, c), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        interpret=_interpret(),
    )(*phases)


def _blur_up_kernel(coef_ref, off_ref, x_ref, o_ref, *, h, w):
    """2x upsample + 4-tap FIR in DIRECT POLYPHASE form, ONE PHASE per
    grid program.

    With the zero-stuffed signal only every other tap hits data, so each
    output phase along one axis is a 2-tap filter (see blur2x_up for the
    derivation):
      out[2u]   = e0 * x[u-1] + e1 * x[u]
      out[2u+1] = o0 * x[u]   + o1 * x[u+1]
    A 2-D phase is therefore a 4-term sum of SHIFTED INPUT SLICES, computed
    straight from the padded block — no transposes, no interleave stack, no
    [2H, W] intermediate. The phase index lives on the GRID (grid=(n, 4))
    with per-phase coefficients/offsets read from SMEM tables, so each
    program holds only the input block plus ONE [H, W, C] phase plane
    (earlier whole-array / 4-output formulations peaked ~28MB of scoped
    VMEM at 64x64x128 and failed to compile on v5e).

    coef_ref: SMEM [4, 4] phase coefficients; off_ref: SMEM [4, 4] int32
    slice starts (oh0, oh1, ow0, ow1). Input block [1, H+2, W+2, C]
    (padded 1 low + 1 high; x[u] -> xp[u+1]); output block [1, 1, H, W, C].
    """
    p = pl.program_id(1)
    oh0, oh1 = off_ref[p, 0], off_ref[p, 1]
    ow0, ow1 = off_ref[p, 2], off_ref[p, 3]

    def sl(oh, ow):
        # dynamic-start ref load (the Mosaic-supported dynamic slice form)
        return x_ref[0, pl.ds(oh, h), pl.ds(ow, w), :]

    o_ref[0, 0] = (
        coef_ref[p, 0] * sl(oh0, ow0)
        + coef_ref[p, 1] * sl(oh0, ow1)
        + coef_ref[p, 2] * sl(oh1, ow0)
        + coef_ref[p, 3] * sl(oh1, ow1)
    )


def blur2x_up(x: jax.Array, kernel_1d) -> jax.Array:
    """FIR 2x upsample with a separable 4-tap kernel (NHWC), gain 4
    (matches ``upsample_2x(x, make_kernel(k))``).

    Derivation: upsample_2x pads the zero-stuffed signal by (2, 1) and
    correlates with the flipped kernel kc:
      out[m] = sum_t kc[t] * z[m + t - 2],  z[2i] = x[i], z odd = 0
      even m=2u: t in {0, 2} -> kc0*x[u-1] + kc2*x[u]
      odd  m=2u+1: t in {1, 3} -> kc1*x[u] + kc3*x[u+1]
    """
    k = np.asarray(kernel_1d, np.float64)
    k = k / k.sum() * 2.0  # per-axis gain 2 (total 4 = factor^2)
    kc = k[::-1]  # correlation taps
    n, h, w, c = x.shape
    # per-axis (coefficient, offset-into-padded-x) pairs, phase 0 / 1
    pairs = (((kc[0], 0), (kc[2], 1)), ((kc[1], 1), (kc[3], 2)))
    coefs, offs = [], []
    for a in range(2):
        (ca0, ha0), (ca1, ha1) = pairs[a]
        for b in range(2):
            (cb0, wb0), (cb1, wb1) = pairs[b]
            coefs.append([ca0 * cb0, ca0 * cb1, ca1 * cb0, ca1 * cb1])
            offs.append([ha0, ha1, wb0, wb1])
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    phases = pl.pallas_call(
        functools.partial(_blur_up_kernel, h=h, w=w),
        out_shape=jax.ShapeDtypeStruct((n, 4, h, w, c), x.dtype),
        grid=(n, 4),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (1, h + 2, w + 2, c),
                lambda i, p: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, h, w, c), lambda i, p: (i, p, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        interpret=_interpret(),
    )(
        jnp.asarray(coefs, x.dtype),
        jnp.asarray(offs, jnp.int32),
        xp,
    )
    # pixel-shuffle interleave (XLA, one pass): phase a*2+b -> out[2u+a, 2v+b]
    row0 = jnp.stack([phases[:, 0], phases[:, 1]], axis=3).reshape(n, h, 2 * w, c)
    row1 = jnp.stack([phases[:, 2], phases[:, 3]], axis=3).reshape(n, h, 2 * w, c)
    return jnp.stack([row0, row1], axis=2).reshape(n, 2 * h, 2 * w, c)


# ---------------------------------------------------------------------------
# stride-1 separable FIR blur (the D ConvLayer pre-blur, models/blocks.py)
# ---------------------------------------------------------------------------


def _blur_sep_kernel(xp_ref, o_ref, vin, vt, vout, sems, *, rt, ct, th,
                     h_out, w_out_al, klen):
    """One row-tile of a separable stride-1 FIR: DMA a (th+klen-1)-row slab
    of the PADDED input from HBM, run the H pass into a VMEM scratch, the
    W pass out of it (ref-load slices — Mosaic handles small unaligned
    static sublane offsets on loads, like the blur2x_down kernel), DMA the
    th-row result out.

    The last tile's start is clamped to h_out-th (overlap-recompute): the
    window always lies inside the padded input, and overlapping rows are
    recomputed identically, so dynamic starts stay size-static. All W
    extents are pre-aligned to the sublane tile (8) by the caller — HBM
    memref slices require it."""
    b = pl.program_id(0)
    p = pl.program_id(1)
    s = jnp.maximum(jnp.minimum(p * th, h_out - th), 0)
    in_dma = pltpu.make_async_copy(
        xp_ref.at[b, pl.ds(s, th + klen - 1)], vin, sems.at[0]
    )
    in_dma.start()
    in_dma.wait()
    # accumulate INTO the scratch refs: building the sums as one big value
    # expression makes Mosaic stack-allocate every term (34MB of scoped
    # VMEM at 256x256x128 — compile-time OOM); read-modify-write keeps one
    # slab live at a time
    for i, tap in enumerate(rt):
        term = tap * vin[i : i + th, :, :]
        vt[...] = term if i == 0 else vt[...] + term
    for j, tap in enumerate(ct):
        term = tap * vt[:, j : j + w_out_al, :]
        vout[...] = term if j == 0 else vout[...] + term
    out_dma = pltpu.make_async_copy(vout, o_ref.at[b, pl.ds(s, th)], sems.at[1])
    out_dma.start()
    out_dma.wait()


def _blur_tile_rows(h_out, wp, w_out, c, klen, itemsize) -> int:
    """Largest row-tile whose input slab + H-pass scratch + output + one
    live accumulation slab fit HALF the VMEM budget (headroom for Mosaic's
    stack temporaries)."""
    per_row = (3 * wp + w_out) * c * itemsize
    th = (_VMEM_BUDGET_BYTES // 2 - (klen - 1) * wp * c * itemsize) // per_row
    return int(min(max(8, th), h_out))


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def blur_sep(x: jax.Array, row_taps: tuple, col_taps: tuple,
             pad: tuple[int, int]) -> jax.Array:
    """Separable stride-1 FIR blur on NHWC, CORRELATION semantics
    (``out[u,v] = sum_ij rt[i]*ct[j]*xp[u+i, v+j]`` over the padded input).

    TPU path: one manual-DMA Mosaic kernel per row tile — the input is
    read from HBM exactly once and the output written once, vs the
    depthwise lax.conv (13-30% of roofline) and the XLA shifted-slice form
    (pad + intermediate materialized). Measured on the batch-16 512px D
    pyramid: see tools/blur_roofline_bench.py. Differentiable via
    custom_vjp: the backward pass is the same kernel with flipped taps and
    complementary pads."""
    return _blur_sep_impl(x, row_taps, col_taps, pad)


def _blur_sep_impl(x, row_taps, col_taps, pad):
    p0, p1 = pad
    n, h, w, c = x.shape
    klen = len(row_taps)
    assert len(col_taps) == klen
    hp, wp = h + p0 + p1, w + p0 + p1
    h_out, w_out = hp - klen + 1, wp - klen + 1
    # HBM memref slices need W extents aligned to the sublane tile (8):
    # align the OUTPUT width up, then the input width so the W pass has
    # klen-1 extra columns; the alignment garbage is sliced off at the end
    w_out_al = -(-w_out // 8) * 8
    wp_al = -(-(w_out_al + klen - 1) // 8) * 8
    xp = jnp.pad(x, ((0, 0), (p0, p1), (p0, wp_al - w - p0), (0, 0)))
    rt = tuple(float(v) for v in row_taps)
    ct = tuple(float(v) for v in col_taps)
    th = _blur_tile_rows(h_out, wp_al, w_out_al, c, klen, x.dtype.itemsize)
    n_tiles = -(-h_out // th)
    out = pl.pallas_call(
        functools.partial(
            _blur_sep_kernel, rt=rt, ct=ct, th=th, h_out=h_out,
            w_out_al=w_out_al, klen=klen,
        ),
        out_shape=jax.ShapeDtypeStruct((n, h_out, w_out_al, c), x.dtype),
        grid=(n, n_tiles),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((th + klen - 1, wp_al, c), x.dtype),
            pltpu.VMEM((th, wp_al, c), x.dtype),
            pltpu.VMEM((th, w_out_al, c), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=_interpret(),
    )(xp)
    return out[:, :, :w_out, :]


def _blur_sep_fwd(x, row_taps, col_taps, pad):
    return blur_sep(x, row_taps, col_taps, pad), None


def _blur_sep_bwd(row_taps, col_taps, pad, _res, dy):
    # d corr(pad_p(x), A) / dx = corr(pad_{K-1-p}(dy), flip(A))
    klen = len(row_taps)
    q = (klen - 1 - pad[0], klen - 1 - pad[1])
    dx = blur_sep(
        dy, tuple(reversed(row_taps)), tuple(reversed(col_taps)), q
    )
    return (dx,)


blur_sep.defvjp(_blur_sep_fwd, _blur_sep_bwd)


def pallas_enabled() -> bool:
    return os.environ.get("GANCTL_PALLAS", "0") == "1"


# per-program VMEM footprint limit for the fused blur kernels: the
# double-buffered (2x) input + output blocks must fit scoped VMEM (~16MB
# on v5e); beyond this the dispatch falls back to the lax conv path
# (which XLA tiles arbitrarily). 12MB of the 16 leaves headroom for the
# kernels' accumulator temporaries.
_VMEM_BUDGET_BYTES = 12 * 1024 * 1024


def blur_fits_vmem(h: int, w: int, c: int, itemsize: int = 4,
                   direction: str = "up") -> bool:
    """Per-direction footprint estimate for the fused blur kernels.

    up (grid=(n, 4), one phase per program): the padded input block plus ONE
    [h, w, c] phase plane. down (grid=(n,)): four deinterleaved phase blocks
    (~= one padded input block in total) plus an [h/2, w/2, c] output —
    ~4x less output than up's whole-phase estimate, so downsample stays on
    the pallas path at sizes where up must fall back. Both estimates are
    charged 2x: with a multi-program grid the Mosaic pipeline prefetches
    block i+1's inputs (and holds block i-1's output DMA) while computing
    block i, so the live footprint is two buffer generations."""
    x_block = (h + 2) * (w + 2) * c * itemsize
    if direction == "down":
        out_block = (h // 2) * (w // 2) * c * itemsize
    else:
        out_block = h * w * c * itemsize
    return 2 * (x_block + out_block) <= _VMEM_BUDGET_BYTES
