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


def test_random_placements_reference_semantics():
    """random_placements matches RandomMiniBatchUtils.randomize_places_in_batch
    (reference mini_batch_random_multi_split_utils.py:45-68) draw-for-draw:
    even sizes uniform over the count_range, independent per-group start
    draws (overlaps across groups and non-covering placements both occur),
    and the not-same masks pair each group's COMPLEMENT rows by adjacency
    (get_not_sub_group + make_not_same_last_layer_mask bookkeeping)."""
    import numpy as np

    from gan_control_tpu.latent.groups import (
        GroupSpec,
        LatentGroup,
        arrangement_from_placements,
        arrangement_from_spec,
        random_placements,
    )

    spec = GroupSpec(groups=(
        LatentGroup("id", 0, 32, mb_start=0, mb_end=4, count_range=(2, 6)),
        LatentGroup("other", 32, 64, mb_start=4, mb_end=8, count_range=(2, 6)),
    ), mini_batch=8, style_dim=64)
    rng = np.random.default_rng(0)
    sizes, overlap, noncover = set(), False, False
    for _ in range(300):
        pl = random_placements(spec, rng)
        for g, starts in pl.items():
            sizes.add((g, 2 * len(starts)))
            assert all(s % 2 == 0 and 0 <= s < 8 for s in starts)
        overlap |= bool(set(pl["id"]) & set(pl["other"]))
        noncover |= (len(set(pl["id"]) | set(pl["other"])) * 2 < 8)
        arr = arrangement_from_placements(spec, pl)
        for g in ("id", "other"):
            in_g = np.zeros(8, bool)
            for s in pl[g]:
                in_g[s] = in_g[s + 1] = True
            comp = np.flatnonzero(~in_g)
            nm = np.asarray(arr.not_same_pair_masks[g])
            assert nm.sum() == len(comp) // 2
            for a, b in zip(comp[0::2], comp[1::2]):
                assert nm[max(a, b), min(a, b)]
    assert sizes == {(g, c) for g in ("id", "other") for c in (2, 4, 6)}
    assert overlap and noncover

    # a group WITHOUT a count_range keeps its static placement (the
    # reference only re-randomizes groups with count_in_mini_bach)
    spec2 = GroupSpec(groups=(
        LatentGroup("id", 0, 32, mb_start=0, mb_end=4, count_range=(2, 6)),
        LatentGroup("other", 32, 64, mb_start=4, mb_end=8),
    ), mini_batch=8, style_dim=64)
    for _ in range(20):
        assert random_placements(spec2, rng)["other"] == [4, 6]

    # static arrangement: each group's not-same pairs are exactly the other
    # group's arranged pairs (covering even-aligned placement)
    arr_s = arrangement_from_spec(spec)
    np.testing.assert_array_equal(
        np.asarray(arr_s.not_same_pair_masks["id"]),
        np.asarray(arr_s.same_pair_masks["other"]),
    )
