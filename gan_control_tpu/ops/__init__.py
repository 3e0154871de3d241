"""L0 ops layer: the StyleGAN2 resampling / activation / modulated-conv
primitives, implemented TPU-first.

The reference designs for (but ships without) fused CUDA kernels
(reference: models/gan_model.py:19-50, README.md:88-89); here the same three
primitives are first-class XLA/Pallas ops.
"""

from gan_control_tpu.ops.upfirdn2d import (
    upfirdn2d,
    make_kernel,
    blur,
    upsample_2x,
    downsample_2x,
)
from gan_control_tpu.ops.fused_act import fused_leaky_relu
from gan_control_tpu.ops.modulated_conv import modulated_conv2d

__all__ = [
    "upfirdn2d",
    "make_kernel",
    "blur",
    "upsample_2x",
    "downsample_2x",
    "fused_leaky_relu",
    "modulated_conv2d",
]
