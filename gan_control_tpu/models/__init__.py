"""L1/L2 model layer: blocks, Generator, Discriminator, FcStack controller."""

from gan_control_tpu.models.generator import Generator, channel_table, mean_latent
from gan_control_tpu.models.discriminator import Discriminator
from gan_control_tpu.models.controller import FcStack
