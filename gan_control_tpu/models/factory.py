"""Model construction from the JSON config schema — shared by trainers and
inference so both sides build byte-identical module configs.

Reference: the Generator/Discriminator constructor calls in
generator_trainer.py:121-151 and inference/inference.py:131-149."""

from __future__ import annotations

from typing import Any, Mapping

import jax.numpy as jnp

from gan_control_tpu.latent.groups import GroupSpec
from gan_control_tpu.models.discriminator import Discriminator
from gan_control_tpu.models.generator import Generator


def build_group_spec(config: Mapping[str, Any]) -> GroupSpec | None:
    mc = config["model_config"]
    tc = config["training_config"]
    if mc.get("vanilla", False):
        return None
    return GroupSpec.from_config(
        tc["sub_groups_dict"], tc["mini_batch"], style_dim=mc.get("latent_size", 512)
    )


def build_generator(config: Mapping[str, Any], spec: GroupSpec | None) -> Generator:
    mc = config["model_config"]
    size = mc["size"]
    model_mode = "896" if size == 896 else "normal"
    if size == 896:
        size = 1024  # the '896' mode runs the 1024 ladder with crops
    return Generator(
        size=size,
        style_dim=mc.get("latent_size", 512),
        n_mlp=mc.get("n_mlp", 8),
        channel_multiplier=mc.get("channel_multiplier", 2.0),
        max_channels=mc.get("max_channels", 512),
        out_channels=mc.get("img_channels", 3),
        split_fc=mc.get("split_fc", False),
        marge_fc=mc.get("marge_fc", False),
        fc_groups=None if spec is None else spec.fc_dims(),
        model_mode=model_mode,
        noise_mode=mc.get("g_noise_mode", "normal"),
        remat=mc.get("remat", False),
        # mixed precision: synthesis in bfloat16 (params + mapping stay
        # float32); the MXU-native training configuration on TPU
        dtype=jnp.bfloat16 if mc.get("mixed_precision", False) else jnp.float32,
    )


def build_discriminator(config: Mapping[str, Any]) -> Discriminator:
    mc = config["model_config"]
    size = mc["size"]
    model_mode = "896" if size == 896 else "normal"
    if size == 896:
        size = 1024
    return Discriminator(
        size=size,
        channel_multiplier=mc.get("channel_multiplier", 2.0),
        max_channels=mc.get("max_channels", 512),
        in_channels=mc.get("img_channels", 3),
        model_mode=model_mode,
        remat=mc.get("remat", False),
        # optional verification branch (reference gan_model.py:925-951 ctor
        # args; exposed here via model_config keys)
        verification=mc.get("verification", False),
        verification_res_split=mc.get("verification_res_split"),
        verification_dim=mc.get("verification_dim", 128),
        dtype=jnp.bfloat16 if mc.get("mixed_precision", False) else jnp.float32,
    )
