"""L9 projection (GAN inversion) layer: LPIPS perceptual loss + latent
optimization utilities (reference projection/)."""

from gan_control_tpu.projection.lpips import LPIPS, lpips_distance
from gan_control_tpu.projection.projection import (
    get_avg_latent,
    get_lr,
    get_pca_groups,
    latent_noise,
    make_image,
    noise_regularize,
    project,
)
