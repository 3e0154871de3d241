"""Loss-registry integration: build AttributeLossSpecs from the JSON config
schema (random weights — pretrained checkpoints are external downloads) and
evaluate the full contrastive loss path on generated-image-shaped input."""

import numpy as np

import jax
import jax.numpy as jnp

from gan_control_tpu.latent.groups import GroupSpec, LatentGroup
from gan_control_tpu.losses.registry import build_attr_losses
from gan_control_tpu.training.train_step import _attr_losses_for_batch


EMBEDDING_BLOCK = {
    "enabled": True,
    "center_crop": None,
    "model_path": "/nonexistent/model_ir_se50.pth",
    "num_layers": 50,
    "drop_ratio": 0.6,
    "mode": "ir_se",
    "lower_thres": [0.154, 0.161, 0.202, 0.166],
    "upper_thres": [0.186, 0.185, 0.231, 0.129],
    "last_lower_thres": 0.5,
    "last_upper_thres": 1.8,
    "intermediate_layers_weights": [0, 0, 0, 0],
    "last_layer_weight": 0.25,
    "same_group_name": "id",
    "focus_on_list": ["not_same_as_last_layer"] * 4 + ["same_as_last_layer"],
}


def test_registry_builds_and_contrastive_runs():
    tc = {"embedding_loss": EMBEDDING_BLOCK}
    specs, params = build_attr_losses(tc)
    assert len(specs) == 1
    al = specs[0]
    assert al.name == "embedding_loss" and al.group == "id"
    assert al.cfg.weights == (0, 0, 0, 0, 0.25)

    spec = GroupSpec(
        groups=(
            LatentGroup("id", 0, 256, mb_start=0, mb_end=4),
            LatentGroup("other", 256, 512, mb_start=4, mb_end=8),
        ),
        mini_batch=8,
    )
    images = jax.random.normal(jax.random.PRNGKey(0), (8, 64, 64, 3)) * 0.3
    total, metrics = _attr_losses_for_batch([al], spec, params, images, num_mini=1)
    assert np.isfinite(float(total))
    assert "g_embedding_loss" in metrics

    # gradient flows through the frozen predictor into the images
    g = jax.grad(
        lambda imgs: _attr_losses_for_batch([al], spec, params, imgs, 1)[0]
    )(images)
    assert float(jnp.max(jnp.abs(g))) > 0


def test_registry_recon3d_sub_losses():
    tc = {
        "recon_3d_loss": {
            "enabled": True,
            "center_crop": None,
            "model_path": "/nonexistent/recon.pt",
            "lower_thres": [], "upper_thres": [],
            "last_lower_thres": 0.0, "last_upper_thres": 1.0,
            "intermediate_layers_weights": [], "last_layer_weight": 1.0,
            "same_group_name": "other",
            "focus_on_list": ["same_as_last_layer"],
            "gamma_loss": {
                "enabled": True,
                "lower_thres": [], "upper_thres": [],
                "last_lower_thres": 0.0, "last_upper_thres": 0.08,
                "intermediate_layers_weights": [], "last_layer_weight": 1.5,
                "same_group_name": "gamma",
                "focus_on_list": ["same_as_last_layer"],
            },
            "angles_loss": {"enabled": False},
        }
    }
    specs, params = build_attr_losses(tc)
    assert len(specs) == 1
    al = specs[0]
    assert al.name == "recon_gamma_loss" and al.group == "gamma"
    assert "recon_gamma_loss" in params

    # shared-skeleton slicing: gamma sub-feature is 27-d
    images = jax.random.normal(jax.random.PRNGKey(1), (4, 64, 64, 3)) * 0.3
    feats = al.feature_fn(params["recon_gamma_loss"], images)
    assert feats[-1].shape == (4, 27)
