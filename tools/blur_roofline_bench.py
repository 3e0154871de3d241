#!/usr/bin/env python
"""A/B + roofline measurement for the D-pyramid blur (VERDICT r2 item 6).

The discriminator's ConvLayer downsample path runs a standalone 4x4 FIR
blur (models/blocks.py:283-286) before the stride-2 conv. This tool times
that exact op at every 512-pixel D-pyramid shape (batch 16) on the real
chip and reports achieved HBM bandwidth vs the v5e roofline (~819 GB/s),
for both the lax depthwise-conv path and (when GANCTL_PALLAS=1 kernels
exist for the shape) the Pallas path. The numbers drive the dispatch
default recorded in ops/pallas_kernels.py.

Run on the TPU:  python tools/blur_roofline_bench.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

V5E_HBM_GBPS = 819.0  # v5e peak HBM bandwidth

# (h, c_in) of every ConvLayer downsample blur in the 512px D
# (channel_multiplier=2 table) + the ResBlock 1x1 skip blurs (same shapes)
D_PYRAMID = [
    (512, 64),
    (256, 128),
    (128, 256),
    (64, 512),
    (32, 512),
    (16, 512),
    (8, 512),
]
BATCH = 16


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from gan_control_tpu.ops.upfirdn2d import (
        blur,
        blur_pad_downsample,
        make_kernel,
        upfirdn2d,
    )

    k = make_kernel((1, 3, 3, 1))
    pad0, pad1 = blur_pad_downsample(4, 3)

    from gan_control_tpu.ops.pallas_kernels import blur_sep
    from gan_control_tpu.ops.upfirdn2d import _blur_separable, _separable_taps

    sep = _separable_taps(k)
    rt = tuple(float(v) for v in sep[0][::-1])
    ct = tuple(float(v) for v in sep[1][::-1])
    paths = {
        # the depthwise lax.conv form (XLA densifies feature_group_count=C)
        "conv": lambda x: upfirdn2d(x, k.astype(x.dtype), up=1, down=1,
                                    pad=(pad0, pad1)),
        # XLA shifted-slice MAC form
        "sepMAC": lambda x: _blur_separable(x, sep[0], sep[1], (pad0, pad1)),
        # manual-DMA Mosaic kernel (what blur() dispatches on TPU)
        "pallas": lambda x: blur_sep(x, rt, ct, (pad0, pad1)),
    }

    print(f"backend={jax.default_backend()} batch={BATCH} pads=({pad0},{pad1})")
    for dtype_name, dtype in (("bf16", jnp.bfloat16), ("f32", jnp.float32)):
        totals = dict.fromkeys(paths, 0.0)
        for h, c in D_PYRAMID:
            x = jnp.asarray(
                np.random.default_rng(0).standard_normal((BATCH, h, h, c)),
                dtype,
            )
            line = f"  {dtype_name} {h:4d}x{h:<4d} c={c:<4d}"
            for name, impl in paths.items():
                if name == "pallas" and c % 128 != 0:
                    line += f"  {name}     n/a (c%128)        "
                    continue
                fn = jax.jit(lambda x, _i=impl: jnp.sum(_i(x)))
                float(fn(x))  # compile + warm
                n = 30
                t0 = time.perf_counter()
                vals = [fn(x) for _ in range(n)]
                float(np.asarray(jnp.stack(vals)).sum())
                dt = (time.perf_counter() - t0) / n
                h_out = h + pad0 + pad1 - 3
                bytes_moved = (
                    BATCH * h * h * c + BATCH * h_out * h_out * c
                ) * x.dtype.itemsize
                gbps = bytes_moved / dt / 1e9
                totals[name] += dt * 1e3
                line += (f"  {name} {dt * 1e3:7.3f} ms "
                         f"({100 * gbps / V5E_HBM_GBPS:5.1f}% roof)")
            print(line)
        for name, total in totals.items():
            print(f"  {dtype_name} D-pyramid total [{name}]: {total:.3f} ms")


if __name__ == "__main__":
    main()
