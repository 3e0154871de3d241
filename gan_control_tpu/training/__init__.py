"""L5 training layer: SPMD train steps, optimizers, trainer state.

Reference: trainers/generator_trainer.py + trainers/utils.py. The
DataParallel scatter/gather of the reference becomes ONE jitted SPMD step
with the batch sharded over an ICI mesh (SURVEY.md §2.9, §5.8).
"""

from gan_control_tpu.training.gan_losses import (
    d_logistic_loss,
    g_nonsaturating_loss,
    r1_penalty,
    path_length_penalty,
)
from gan_control_tpu.training.state import GANTrainState, make_gan_optimizers
