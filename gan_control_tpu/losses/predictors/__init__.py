"""Frozen predictor networks (flax) powering the contrastive losses.

Reference packages: losses/arc_face, deep_head_pose, deep_expectation_age,
facial_features_esr, hair_loss, face3dmm_recon, stayle, dogfacenet, imagenet
(SURVEY.md §2.4). Each module here follows the registry interface documented
in gan_control_tpu/losses/registry.py."""
