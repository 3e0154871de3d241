"""gan_control_tpu — TPU-native (JAX/XLA/Pallas) rebuild of GAN-Control.

A brand-new framework with the capabilities of amazon-science/gan-control
(ICCV 2021 "GAN-Control: Explicitly Controllable GANs"), designed TPU-first:

- NHWC layout everywhere (XLA TPU native).
- `upfirdn2d` as a single `lax.conv_general_dilated` (lhs_dilation upsampling,
  negative padding, strided downsampling) plus an optional Pallas kernel.
- Modulated convolution in the input-scale / output-demodulate formulation
  (mathematically identical to per-sample weight modulation, but keeps the
  conv batched on the MXU without materializing per-sample weights).
- One jitted SPMD train step; batch sharded over an ICI mesh via
  `jax.sharding`; gradients reduced with XLA collectives.

Reference behavior contract: /root/reference/src/gan_control (see SURVEY.md).
"""

__version__ = "0.1.0"
