"""L4 loss layer: contrastive disentanglement criterion + frozen predictors.

Reference: losses/loss_model.py + 9 predictor packages (see SURVEY.md §2.4).
"""

from gan_control_tpu.losses.contrastive import (
    ContrastiveConfig,
    contrastive_loss,
    pairwise_l1,
    pairwise_sq_l2,
    same_pair_mask,
    not_same_pair_mask,
    strict_lower_mask,
)
