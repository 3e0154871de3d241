"""End-to-end train-step tests on a tiny model (size 16) with a fake
frozen predictor — exercises d_step, d_reg (R1), g_step (adversarial +
contrastive), g_reg (path length), EMA, and data-sharded execution on the
8-device CPU mesh."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gan_control_tpu.latent.groups import GroupSpec, LatentGroup
from gan_control_tpu.losses.contrastive import ContrastiveConfig, pairwise_sq_l2
from gan_control_tpu.models.discriminator import Discriminator
from gan_control_tpu.models.generator import Generator
from gan_control_tpu.training.state import init_gan_state, make_gan_optimizers
from gan_control_tpu.training.train_step import (
    AttributeLossSpec,
    TrainStepConfig,
    make_train_steps,
)

SIZE = 16
BATCH = 8
STYLE = 64


def tiny_spec():
    return GroupSpec(
        groups=(
            LatentGroup("id", 0, 32, mb_start=0, mb_end=4,
                        count_range=(2, 6)),
            LatentGroup("other", 32, 64, mb_start=4, mb_end=8,
                        count_range=(2, 6)),
        ),
        mini_batch=BATCH,
        style_dim=STYLE,
    )


def fake_predictor_features(params, images):
    """Stand-in frozen predictor: avg-pool color moments -> 'embedding'.

    Differentiable wrt images like a real frozen net."""
    del params
    emb = jnp.mean(images, axis=(1, 2))  # [B, 3]
    inter = jnp.mean(images.reshape(images.shape[0], 4, -1), axis=2)
    return [inter, emb]


@pytest.fixture(scope="module")
def setup():
    spec = tiny_spec()
    gen = Generator(size=SIZE, style_dim=STYLE, n_mlp=2, split_fc=True,
                    fc_groups=spec.fc_dims(), max_channels=32)
    disc = Discriminator(size=SIZE, max_channels=32)
    tc = {"lr_g": 2e-3, "lr_d": 2e-3, "g_reg_every": 4, "d_reg_every": 16}
    g_tx, d_tx = make_gan_optimizers(tc)
    cfg = TrainStepConfig(batch=BATCH, mini_batch=BATCH, style_dim=STYLE)
    attr = (
        AttributeLossSpec(
            name="embedding_loss",
            group="id",
            cfg=ContrastiveConfig(
                intermediate_weights=(0.5,),
                last_layer_weight=1.0,
                lower_thres=(0.1,),
                upper_thres=(0.5,),
                last_lower_thres=0.1,
                last_upper_thres=1.0,
                focus_on=("not_same_as_last_layer", "same_as_last_layer"),
            ),
            feature_fn=fake_predictor_features,
            dist_fn=pairwise_sq_l2,
        ),
    )
    steps = make_train_steps(gen, disc, cfg, spec=spec, attr_losses=attr,
                             g_tx=g_tx, d_tx=d_tx)
    state = init_gan_state(gen, disc, g_tx, d_tx, jax.random.PRNGKey(0),
                           style_dim=STYLE)
    return spec, gen, disc, steps, state


def test_full_training_cycle(setup):
    spec, gen, disc, steps, state = setup
    rng = jax.random.PRNGKey(1)
    z = jax.random.normal(rng, (BATCH, STYLE))
    real = jax.random.normal(jax.random.PRNGKey(2), (BATCH, SIZE, SIZE, 3)) * 0.1
    pred_params = {"embedding_loss": {}}

    d_step = jax.jit(steps["d_step"])
    g_step = jax.jit(steps["g_step"])
    d_reg = jax.jit(steps["d_reg_step"])
    g_reg = jax.jit(steps["g_reg_step"])

    state1, d_metrics = d_step(state, real, (z,))
    assert jnp.isfinite(d_metrics["d_loss"])
    # D params changed, G untouched
    d_leaf0 = jax.tree_util.tree_leaves(state.d_params)[0]
    d_leaf1 = jax.tree_util.tree_leaves(state1.d_params)[0]
    assert not np.allclose(d_leaf0, d_leaf1)

    state2, r1_metrics = d_reg(state1, real)
    assert jnp.isfinite(r1_metrics["d_r1_loss"])

    state3, g_metrics = g_step(state2, (z,), pred_params)
    assert jnp.isfinite(g_metrics["g_adv_loss"])
    assert jnp.isfinite(g_metrics["g_embedding_loss"])
    assert int(state3.step) == 1
    # EMA moved toward new params but is not equal to them
    ema_leaf = jax.tree_util.tree_leaves(state3.g_ema)[0]
    g_leaf = jax.tree_util.tree_leaves(state3.g_params)[0]
    old_g_leaf = jax.tree_util.tree_leaves(state2.g_params)[0]
    assert not np.allclose(ema_leaf, g_leaf) or np.allclose(g_leaf, old_g_leaf)

    state4, path_metrics = g_reg(state3, (z[: BATCH // 2],))
    assert jnp.isfinite(path_metrics["g_path_loss"])
    assert jnp.isfinite(path_metrics["g_mean_path_length"])
    assert float(path_metrics["g_path_length"]) > 0


def test_style_mixing_g_step(setup):
    """Two z's -> random inject_index mixing inside the jitted step
    (reference gan_model.py:763-764 + mixing_noise)."""
    spec, gen, disc, steps, state = setup
    z1 = jax.random.normal(jax.random.PRNGKey(3), (BATCH, STYLE))
    z2 = jax.random.normal(jax.random.PRNGKey(4), (BATCH, STYLE))
    pred_params = {"embedding_loss": {}}
    g_step = jax.jit(steps["g_step"])
    state2, m = g_step(state, (z1, z2), pred_params)
    assert jnp.isfinite(m["g_loss"])


def test_data_sharded_step_matches_single_device(setup):
    """The SPMD answer to nn.DataParallel: same math, batch sharded over the
    mesh. Verifies numerical equivalence of the d_step on 8 devices vs 1."""
    spec, gen, disc, steps, state = setup
    z = jax.random.normal(jax.random.PRNGKey(1), (BATCH, STYLE))
    real = jax.random.normal(jax.random.PRNGKey(2), (BATCH, SIZE, SIZE, 3)) * 0.1

    mesh = Mesh(np.array(jax.devices()), ("data",))
    batch_sharding = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())

    d_step = jax.jit(steps["d_step"])
    _, m_single = d_step(state, real, (z,))

    real_sh = jax.device_put(real, batch_sharding)
    z_sh = jax.device_put(z, batch_sharding)
    state_sh = jax.device_put(state, repl)
    _, m_sharded = d_step(state_sh, real_sh, (z_sh,))

    np.testing.assert_allclose(
        np.asarray(m_single["d_loss"]), np.asarray(m_sharded["d_loss"]), rtol=2e-4
    )


def test_d_step_ignores_arrangement(setup):
    """The D update samples iid z — re_arrange_z appears only in the
    reference's generator_step (generator_trainer.py:415,419), so d_step
    metrics must be invariant to the group slot placement."""
    spec, gen, disc, steps, state = setup
    # same latent split, swapped mini-batch slots
    swapped = GroupSpec(
        groups=(
            LatentGroup("id", 0, 32, mb_start=4, mb_end=8),
            LatentGroup("other", 32, 64, mb_start=0, mb_end=4),
        ),
        mini_batch=BATCH,
        style_dim=STYLE,
    )
    tc = {"lr_g": 2e-3, "lr_d": 2e-3, "g_reg_every": 4, "d_reg_every": 16}
    from gan_control_tpu.training.state import make_gan_optimizers as _mk

    g_tx, d_tx = _mk(tc)
    cfg = TrainStepConfig(batch=BATCH, mini_batch=BATCH, style_dim=STYLE)
    steps_swapped = make_train_steps(gen, disc, cfg, spec=swapped,
                                     g_tx=g_tx, d_tx=d_tx)
    z = jax.random.normal(jax.random.PRNGKey(5), (BATCH, STYLE))
    real = jax.random.normal(jax.random.PRNGKey(6), (BATCH, SIZE, SIZE, 3)) * 0.1
    _, m1 = jax.jit(steps["d_step"])(state, real, (z,))
    _, m2 = jax.jit(steps_swapped["d_step"])(state, real, (z,))
    np.testing.assert_allclose(
        np.asarray(m1["d_loss"]), np.asarray(m2["d_loss"]), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(m1["fake_score"]), np.asarray(m2["fake_score"]), rtol=1e-5
    )


def test_g_step_arrangement_array_parity(setup):
    """g_step with the static spec tables == g_step fed the SAME placement as
    an Arrangement of arrays (the masked contrastive criterion reproduces the
    reorder-then-triangle bookkeeping exactly)."""
    from gan_control_tpu.latent.groups import arrangement_from_spec

    spec, gen, disc, steps, state = setup
    z = jax.random.normal(jax.random.PRNGKey(7), (BATCH, STYLE))
    pred_params = {"embedding_loss": {}}
    g_step = jax.jit(steps["g_step"])
    _, m_static = g_step(state, (z,), pred_params)
    arr = arrangement_from_spec(spec)
    _, m_dyn = g_step(state, (z,), pred_params, None, arr)
    np.testing.assert_allclose(
        np.asarray(m_static["g_embedding_loss"]),
        np.asarray(m_dyn["g_embedding_loss"]),
        rtol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(m_static["g_loss"]), np.asarray(m_dyn["g_loss"]), rtol=1e-5
    )


def test_g_step_random_arrangements_recompile_free(setup):
    """Two different placements through ONE jitted g_step: different losses,
    one compile."""
    from gan_control_tpu.latent.groups import random_arrangement

    spec, gen, disc, steps, state = setup
    z = jax.random.normal(jax.random.PRNGKey(8), (BATCH, STYLE))
    pred_params = {"embedding_loss": {}}
    g_step = jax.jit(steps["g_step"])
    rng = np.random.default_rng(0)
    arrs = []
    while len(arrs) < 2:
        a = random_arrangement(spec, rng)
        if not any(np.array_equal(a.share_mask, b.share_mask) for b in arrs):
            arrs.append(a)
    _, m1 = g_step(state, (z,), pred_params, None, arrs[0])
    n_compiles = g_step._cache_size()
    _, m2 = g_step(state, (z,), pred_params, None, arrs[1])
    assert g_step._cache_size() == n_compiles, "placement change recompiled"
    # different placements -> different contrastive losses (same z)
    assert not np.allclose(
        np.asarray(m1["g_embedding_loss"]), np.asarray(m2["g_embedding_loss"])
    )


def test_mixed_precision_training_cycle():
    """bf16 G synthesis + D pyramid with f32 params/losses: all four steps
    run, losses are finite f32, params and EMA stay f32, D logits are f32
    (factory wires model_config.mixed_precision to both dtypes)."""
    from gan_control_tpu.models.factory import build_discriminator, build_generator

    spec = tiny_spec()
    config = {
        "model_config": {
            "size": SIZE, "latent_size": STYLE, "n_mlp": 2,
            "max_channels": 32, "split_fc": True, "mixed_precision": True,
        },
        "training_config": {"mini_batch": BATCH, "sub_groups_dict": {}},
    }
    gen = build_generator(config, spec)
    disc = build_discriminator(config)
    assert gen.dtype == jnp.bfloat16 and disc.dtype == jnp.bfloat16

    tc = {"lr_g": 2e-3, "lr_d": 2e-3, "g_reg_every": 4, "d_reg_every": 16}
    g_tx, d_tx = make_gan_optimizers(tc)
    cfg = TrainStepConfig(batch=BATCH, mini_batch=BATCH, style_dim=STYLE)
    attr = (
        AttributeLossSpec(
            name="embedding_loss",
            group="id",
            cfg=ContrastiveConfig(
                intermediate_weights=(0.5,), last_layer_weight=1.0,
                lower_thres=(0.1,), upper_thres=(0.5,),
                last_lower_thres=0.1, last_upper_thres=1.0,
                focus_on=("not_same_as_last_layer", "same_as_last_layer"),
            ),
            feature_fn=fake_predictor_features,
            dist_fn=pairwise_sq_l2,
        ),
    )
    steps = make_train_steps(gen, disc, cfg, spec=spec, attr_losses=attr,
                             g_tx=g_tx, d_tx=d_tx)
    state = init_gan_state(gen, disc, g_tx, d_tx, jax.random.PRNGKey(0),
                           style_dim=STYLE)
    # params are float32 even though compute is bf16
    for leaf in jax.tree_util.tree_leaves(state.g_params):
        assert leaf.dtype == jnp.float32
    for leaf in jax.tree_util.tree_leaves(state.d_params):
        assert leaf.dtype == jnp.float32

    z = jax.random.normal(jax.random.PRNGKey(1), (BATCH, STYLE))
    real = jax.random.normal(jax.random.PRNGKey(2), (BATCH, SIZE, SIZE, 3)) * 0.1
    pred_params = {"embedding_loss": {}}

    # the generator really synthesizes in bf16
    img, _ = gen.apply(state.g_params, [z], rngs={"noise": jax.random.PRNGKey(3)})
    assert img.dtype == jnp.bfloat16
    logit, _ = disc.apply(state.d_params, img)
    assert logit.dtype == jnp.float32

    state, dm = jax.jit(steps["d_step"])(state, real, (z,))
    state, rm = jax.jit(steps["d_reg_step"])(state, real)
    state, gm = jax.jit(steps["g_step"])(state, (z,), pred_params)
    state, pm = jax.jit(steps["g_reg_step"])(state, (z[: BATCH // 2],))
    for v in (dm["d_loss"], rm["d_r1_loss"], gm["g_loss"],
              gm["g_embedding_loss"], pm["g_path_loss"]):
        assert jnp.isfinite(v), v
        assert v.dtype == jnp.float32
    for leaf in jax.tree_util.tree_leaves(state.g_params):
        assert leaf.dtype == jnp.float32
    for leaf in jax.tree_util.tree_leaves(state.g_ema):
        assert leaf.dtype == jnp.float32


def test_reg_steps_with_remat_variants_match(setup):
    """g_reg/d_reg on generator.clone(remat=True)/discriminator.clone(
    remat=True) are numerically identical to the plain modules (remat
    changes the backward schedule, not the math) — the per-step remat plan
    the trainer uses at 512²."""
    spec, gen, disc, steps, state = setup
    tc = {"lr_g": 2e-3, "lr_d": 2e-3, "g_reg_every": 4, "d_reg_every": 16}
    g_tx, d_tx = make_gan_optimizers(tc)
    cfg = TrainStepConfig(batch=BATCH, mini_batch=BATCH, style_dim=STYLE)
    steps_reg = make_train_steps(
        gen, disc, cfg, spec=spec, attr_losses=(), g_tx=g_tx, d_tx=d_tx,
        generator_reg=gen.clone(remat=True),
        discriminator_reg=disc.clone(remat=True),
    )
    steps_plain = make_train_steps(
        gen, disc, cfg, spec=spec, attr_losses=(), g_tx=g_tx, d_tx=d_tx,
    )
    z = jax.random.normal(jax.random.PRNGKey(5), (BATCH, STYLE))
    real = jax.random.normal(jax.random.PRNGKey(6), (BATCH, SIZE, SIZE, 3)) * 0.1

    s_a, m_a = jax.jit(steps_reg["g_reg_step"])(state, (z,))
    s_b, m_b = jax.jit(steps_plain["g_reg_step"])(state, (z,))
    np.testing.assert_allclose(
        float(m_a["g_path_loss"]), float(m_b["g_path_loss"]), rtol=1e-5
    )
    la = jax.tree_util.tree_leaves(s_a.g_params)[0]
    lb = jax.tree_util.tree_leaves(s_b.g_params)[0]
    np.testing.assert_allclose(np.asarray(la), np.asarray(lb), atol=1e-6)

    s_a, m_a = jax.jit(steps_reg["d_reg_step"])(state, real)
    s_b, m_b = jax.jit(steps_plain["d_reg_step"])(state, real)
    np.testing.assert_allclose(
        float(m_a["d_r1_loss"]), float(m_b["d_r1_loss"]), rtol=1e-5
    )


def test_sharded_step_collectives_are_gradient_sized(setup):
    """SPMD efficiency contract of the batch-sharded step: the compiled HLO
    communicates ONLY parameter gradients (all-reduce) and the small
    cross-batch contrastive embedding gathers needed for the BxB pairwise
    distance matrix — never image-sized activations. Catches accidental
    activation resharding (the TPU analogue of DataParallel scatter/gather
    overhead the reference pays, gan_model.py DataParallel wrapping)."""
    import re

    from gan_control_tpu.latent.groups import arrangement_from_spec

    spec, gen, disc, steps, state = setup
    mesh = Mesh(np.array(jax.devices()), ("data",))
    bs = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())
    z = jax.device_put(
        jax.random.normal(jax.random.PRNGKey(1), (BATCH, STYLE)), bs
    )
    real = jax.device_put(
        jax.random.normal(jax.random.PRNGKey(2), (BATCH, SIZE, SIZE, 3)), bs
    )
    state_sh = jax.device_put(state, repl)

    def collectives(hlo_text):
        """{op_kind: max tensor elements seen on such a line}."""
        out = {}
        for line in hlo_text.splitlines():
            m = re.search(
                r"\b(all-reduce|all-gather|all-to-all|collective-permute"
                r"|reduce-scatter)\b",
                line,
            )
            if not m:
                continue
            sizes = [
                int(np.prod([int(d) for d in dims.split(",") if d]))
                for dims in re.findall(r"(?:f32|bf16|f16|s32|u32)\[([\d,]*)\]", line)
            ]
            kind = m.group(1)
            out[kind] = max(out.get(kind, 0), max(sizes, default=0))
        return out

    c_d = jax.jit(steps["d_step"]).lower(state_sh, real, (z,)).compile()
    colls_d = collectives(c_d.as_text())
    arr = arrangement_from_spec(spec)
    c_g = (
        jax.jit(steps["g_step"])
        .lower(state_sh, (z,), {"embedding_loss": None}, None, arr)
        .compile()
    )
    colls_g = collectives(c_g.as_text())

    # gradient sync must actually happen
    assert colls_d.get("all-reduce", 0) > 0, colls_d
    assert colls_g.get("all-reduce", 0) > 0, colls_g
    # no resharding collectives at all in d_step, none anywhere for a2a/perm
    for bad in ("all-gather", "all-to-all", "collective-permute"):
        assert bad not in colls_d, colls_d
    for bad in ("all-to-all", "collective-permute"):
        assert bad not in colls_g, colls_g
    # all-gathers stay embedding-sized: the smallest image activation here
    # is [8,16,16,32] = 65536 elements, the largest legitimate gather (the
    # cross-batch contrastive embeddings) is 8192 — a 16384 ceiling
    # separates the regimes
    assert colls_g.get("all-gather", 0) <= 16384, colls_g
    # all-reduces are gradient traffic; XLA's combiner may merge several
    # grads into one flat buffer, so the bound is the total parameter count
    n_params = sum(
        int(np.prod(p.shape))
        for tree in (state.g_params, state.d_params)
        for p in jax.tree_util.tree_leaves(tree)
    )
    for colls in (colls_d, colls_g):
        assert colls.get("all-reduce", 0) <= n_params, (colls, n_params)

    # BOTH regularizer steps must sync gradients too. Guards the r04 bug
    # class: handing jit a host-side slice of a sharded array (e.g.
    # z[:path_batch]) silently destroys the sharding and lowers an
    # UNPARTITIONED program with zero collectives — the trainer instead
    # device_puts the path batch with the batch sharding
    # (generator_trainer.py _sample_z/_put_global_rows), as done here.
    z_path = jax.device_put(
        jax.random.normal(jax.random.PRNGKey(3), (BATCH, STYLE)), bs
    )
    c_dr = jax.jit(steps["d_reg_step"]).lower(state_sh, real).compile()
    colls_dr = collectives(c_dr.as_text())
    c_gr = jax.jit(steps["g_reg_step"]).lower(state_sh, (z_path,)).compile()
    colls_gr = collectives(c_gr.as_text())
    for colls in (colls_dr, colls_gr):
        assert colls.get("all-reduce", 0) > 0, colls
        assert colls.get("all-reduce", 0) <= n_params, (colls, n_params)
        for bad in ("all-to-all", "collective-permute"):
            assert bad not in colls, colls
    assert colls_dr.get("all-gather", 0) <= 16384, colls_dr
    assert colls_gr.get("all-gather", 0) <= 16384, colls_gr


def test_g_reg_step_style_mixing(setup):
    """g_reg_step with two styles regularizes a MIXED w+ (random inject
    index, reference generator_trainer.py:574 forwards mixing_noise) — not
    a broadcast of style 0 only."""
    spec, gen, disc, steps, state = setup
    z0 = jax.random.normal(jax.random.PRNGKey(31), (BATCH // 2, STYLE))
    z1 = jax.random.normal(jax.random.PRNGKey(32), (BATCH // 2, STYLE))
    g_reg = jax.jit(steps["g_reg_step"])
    s_single, m_single = g_reg(state, (z0,))
    s_mixed, m_mixed = g_reg(state, (z0, z1))
    for m in (m_single, m_mixed):
        assert np.isfinite(float(m["g_path_loss"]))
    # the second style must influence the statistic
    assert float(m_mixed["g_path_length"]) != float(m_single["g_path_length"])


def test_shared_forward_runs_once(setup):
    """Specs sharing a share_key run ONE skeleton forward per g_step (the
    reference's calc_pose_losses computes recon-3d features once and
    slices, generator_trainer.py:473-517); each sub-loss slices it."""
    spec, gen, disc, steps, state = setup
    calls = {"n": 0}

    def shared_fwd(pp, imgs):
        calls["n"] += 1  # trace-time counter
        return jnp.mean(imgs, axis=(1, 2))  # [B, 3]

    def sub_spec(name, col):
        return AttributeLossSpec(
            name=name, group="id",
            cfg=ContrastiveConfig(
                intermediate_weights=(), last_layer_weight=1.0,
                lower_thres=(), upper_thres=(),
                last_lower_thres=0.1, last_upper_thres=1.0,
                focus_on=("same_as_last_layer",),
            ),
            feature_fn=lambda pp, x, c=col: [jnp.mean(x, axis=(1, 2))[:, c:c + 1]],
            dist_fn=pairwise_sq_l2,
            share_key="recon",
            shared_forward_fn=shared_fwd,
            extract_fn=lambda vec, c=col: [vec[:, c:c + 1]],
        )

    tc = {"lr_g": 2e-3, "lr_d": 2e-3, "g_reg_every": 4, "d_reg_every": 16}
    g_tx, d_tx = make_gan_optimizers(tc)
    cfg = TrainStepConfig(batch=BATCH, mini_batch=BATCH, style_dim=STYLE,
                          remat_predictors=True)
    attr = (sub_spec("recon_a", 0), sub_spec("recon_b", 1))
    steps2 = make_train_steps(gen, disc, cfg, spec=spec, attr_losses=attr,
                              g_tx=g_tx, d_tx=d_tx)
    z = jax.random.normal(jax.random.PRNGKey(5), (BATCH, STYLE))
    pred_params = {"recon_a": {}, "recon_b": {}}
    _, m = jax.jit(steps2["g_step"])(state, (z,), pred_params)
    assert calls["n"] == 1, f"shared forward traced {calls['n']} times"
    assert np.isfinite(float(m["g_recon_a"])) and np.isfinite(float(m["g_recon_b"]))
    assert float(m["g_recon_a"]) != float(m["g_recon_b"])
