"""Jitted SPMD train steps for phase-1 (disentangled GAN) training.

Behavior contract: GeneratorTrainer's four inner updates
(reference trainers/generator_trainer.py):
  - discriminator_step (:645-667): D logistic loss on G(z) vs real.
  - discriminator_regularize_step (:697-712): R1 every d_reg_every iters,
    weighted ``r1/2 * d_reg_every``.
  - generator_step (:407-436): non-saturating adversarial loss + per-group
    contrastive predictor losses on mini-batches arranged by re_arrange_z.
  - generator_regularize_step (:568-599): path-length penalty every
    g_reg_every iters on a ``batch // path_batch_shrink`` batch, weighted
    ``path_regularize * g_reg_every``.
  - EMA accumulate after every G step (:369).

TPU-first design:
  - Each update is ONE jitted function over the full global batch; the batch
    dim is sharded over the mesh's 'data' axis and parameters are
    replicated, so XLA inserts the gradient all-reduces (the SPMD
    replacement for nn.DataParallel scatter/gather).
  - The reference's sequential mini-batch gradient accumulation
    (`loss.div_(num_mini) ... backward()` per chunk) is algebraically the
    mean over mini-batch chunks of the same loss — computed here in one
    graph; the contrastive distance matrices still couple only rows WITHIN
    a mini_batch chunk, exactly like the reference.
  - Regularize steps are separate compiled functions dispatched host-side by
    iteration number (static control flow; no data-dependent branching
    inside jit).

Frozen predictors enter as `AttributeLossSpec.feature_fn(predictor_params,
images)`; gradients flow through them into G (they are frozen by simply not
updating their params — no stop_gradient).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Mapping, Sequence

import jax
import jax.numpy as jnp
import optax

from gan_control_tpu.latent.groups import (
    Arrangement,
    GroupSpec,
    apply_arrangement_noise,
    apply_arrangement_z,
    re_arrange_z,
    same_not_same_split,
)
from gan_control_tpu.losses.contrastive import (
    ContrastiveConfig,
    contrastive_loss,
    contrastive_loss_masked,
)
from gan_control_tpu.training.gan_losses import (
    d_logistic_loss,
    g_nonsaturating_loss,
    path_length_penalty,
    r1_penalty,
)
from gan_control_tpu.training.state import GANTrainState, ema_decay, ema_update


@dataclasses.dataclass(frozen=True)
class AttributeLossSpec:
    """One enabled contrastive loss (one JSON loss block).

    feature_fn: (predictor_params, images NHWC in [-1,1]) -> list of
      per-layer feature arrays, last entry = the criterion's embedding.
    dist_fn: features -> [N,N] last-layer distance matrix.
    """

    name: str
    group: str
    cfg: ContrastiveConfig
    feature_fn: Callable[[Any, jax.Array], Sequence[jax.Array]]
    dist_fn: Callable[[jax.Array], jax.Array]
    # cross-set variant d(signatures, queries) for separability evaluation;
    # defaults to None (evaluator falls back to squared-L2)
    pair_dist_fn: Callable[[jax.Array, jax.Array], jax.Array] | None = None
    # SHARED skeleton forward (the recon-3d sub-losses all read one R-Net
    # vector, reference generator_trainer.py:473-517): specs carrying the
    # same share_key run shared_forward_fn ONCE per step and slice it with
    # extract_fn — without this each sub-loss would trace its own full
    # R-Net forward (and remat re-forward) on identical inputs, which XLA
    # cannot CSE across jax.checkpoint boundaries. feature_fn stays as the
    # standalone path (separability eval).
    share_key: str | None = None
    shared_forward_fn: Callable[[Any, jax.Array], Any] | None = None
    extract_fn: Callable[[Any], Sequence[jax.Array]] | None = None


@dataclasses.dataclass(frozen=True)
class TrainStepConfig:
    """Static hyper-parameters of the train steps (training_config schema)."""

    batch: int
    mini_batch: int
    r1: float = 1.0
    d_reg_every: int = 16
    g_reg_every: int = 4
    path_regularize: float = 2.0
    path_batch_shrink: int = 2
    g_moving_average: float = 10000.0
    mixing: float = 0.0
    vanilla: bool = False
    style_dim: int = 512
    ada_target: float = 0.6
    ada_length: float = 500_000.0
    ada_enabled: bool = False
    # the configured augment['p']: 0 = adapt p toward ada_target (ADA), a
    # positive value = FIXED augmentation strength, never adapted
    # (reference generator_trainer.py:334, 679-685)
    ada_p_fixed: float = 0.0
    # re-run each frozen predictor in the backward instead of holding all
    # of their activations at once (SURVEY.md §7.3.2 memory plan)
    remat_predictors: bool = True
    # storage dtype of the frozen-predictor battery ("float32" | "bfloat16").
    # float32 matches the reference (loss_model.py builds f32 torch modules);
    # bfloat16 halves the battery's HBM traffic — the g_step limiter is
    # HBM-bound (TRAINING.md roofline table). Contrastive distances and
    # thresholds always stay float32 (features are upcast before the loss);
    # the threshold drift this introduces is measured by
    # tools/precision_drift.py --dtype bfloat16 (WEIGHTS.md table)
    predictor_dtype: str = "float32"


def _attr_losses_for_batch(
    attr_losses: Sequence[AttributeLossSpec],
    spec: GroupSpec | None,
    predictor_params: Mapping[str, Any],
    images: jax.Array,
    num_mini: int,
    remat: bool = False,
    arrangement: Arrangement | None = None,
    dtype=jnp.float32,
):
    """Sum of contrastive losses, averaged over mini-batch chunks.

    With ``remat`` each predictor's loss is wrapped in jax.checkpoint, so
    the backward pass re-runs one frozen net at a time instead of holding
    the activations of all of them simultaneously — the memory plan that
    lets the full FFHQ loss battery (6 predictor graphs) backprop at 512²
    on one chip (SURVEY.md §7.3.2).

    With ``arrangement`` (randomized mini-batch mode) the same/not-same
    bookkeeping comes from the per-step pair-mask ARRAYS instead of the
    static spec tables — one compile covers every placement."""
    total = jnp.zeros((), jnp.float32)
    metrics = {}
    # ``dtype`` is the battery STORAGE dtype (each predictor's backbone runs
    # at images.dtype — the cast at its apply entry keys off this). The
    # contrastive thresholds (lower/upper_thres) were calibrated on float32
    # feature distances, so features are upcast back to f32 below before any
    # distance math regardless of the backbone dtype. int8 storage computes
    # in bf16: the quantized {"q","s"} leaves are dequantized HERE, inside
    # the jitted step, so HBM holds int8 per tensor (registry.
    # dequantize_predictor_params; the A/B lives in tools/battery_share.py).
    if jnp.dtype(dtype) == jnp.int8:
        from gan_control_tpu.losses.registry import dequantize_predictor_params

        dtype = jnp.bfloat16
        predictor_params = dequantize_predictor_params(
            predictor_params, dtype
        )
    images = images.astype(dtype)
    mb = images.shape[0] // num_mini

    def chunked_contrastive(feats, arr, al):
        loss_al = jnp.zeros((), jnp.float32)
        for k in range(num_mini):
            chunk = [
                f[k * mb : (k + 1) * mb].astype(jnp.float32) for f in feats
            ]
            if arr is not None:
                loss_al = loss_al + contrastive_loss_masked(
                    al.cfg, chunk, al.dist_fn,
                    arr.same_pair_masks[al.group],
                    arr.not_same_pair_masks[al.group],
                )
            else:
                same, not_same = zip(
                    *(same_not_same_split(spec, f, al.group) for f in chunk)
                )
                loss_al = loss_al + contrastive_loss(
                    al.cfg, same, not_same, al.dist_fn
                )
        return loss_al / num_mini

    # shared skeleton forwards: ONE (checkpointed) run per share_key; the
    # sub-losses slice its output (reference calc_pose_losses runs
    # calc_features once and splits, generator_trainer.py:473-517)
    shared: dict[str, Any] = {}
    for al in attr_losses:
        if al.share_key is not None and al.share_key not in shared:
            fwd = jax.checkpoint(al.shared_forward_fn) if remat \
                else al.shared_forward_fn
            shared[al.share_key] = fwd(predictor_params[al.name], images)

    for al in attr_losses:
        if al.share_key is not None:
            loss_al = chunked_contrastive(
                al.extract_fn(shared[al.share_key]), arrangement, al
            )
        else:
            def one_loss(pp, imgs, arr, al=al):
                return chunked_contrastive(al.feature_fn(pp, imgs), arr, al)

            fn = jax.checkpoint(one_loss) if remat else one_loss
            loss_al = fn(predictor_params[al.name], images, arrangement)
        metrics[f"g_{al.name}"] = loss_al
        total = total + loss_al
    return total, metrics


def make_train_steps(
    generator,
    discriminator,
    cfg: TrainStepConfig,
    spec: GroupSpec | None = None,
    attr_losses: Sequence[AttributeLossSpec] = (),
    g_tx: optax.GradientTransformation | None = None,
    d_tx: optax.GradientTransformation | None = None,
    augment_fn: Callable[[jax.Array, jax.Array, jax.Array], jax.Array] | None = None,
    generator_reg=None,
    discriminator_reg=None,
):
    """Build the four jitted update functions.

    Args:
      generator / discriminator: flax modules (static config).
      cfg: static step hyper-parameters.
      spec: latent-group table; required unless cfg.vanilla.
      attr_losses: enabled contrastive losses. Entries whose feature_fn is
        shared (recon-3d sub-losses) should pre-slice inside feature_fn.
      g_tx / d_tx: optax optimizers (reg-ratio-scaled Adam by default caller).
      augment_fn: ADA hook (images, p, rng) -> images, applied to D inputs.
      generator_reg / discriminator_reg: optional module variants used ONLY
        by the regularizer steps (same param pytree — e.g.
        ``generator.clone(remat=True)``). The R1 / path-length double
        backprops are the HBM high-water mark at 512²; rematerializing just
        those graphs lets the hot d/g steps run without remat.

    Returns dict with 'd_step', 'd_reg_step', 'g_step', 'g_reg_step'. All
    take/return GANTrainState as first arg (donated by the caller's jit).
    """
    generator_reg = generator_reg if generator_reg is not None else generator
    discriminator_reg = (
        discriminator_reg if discriminator_reg is not None else discriminator
    )
    num_mini = cfg.batch // cfg.mini_batch
    assert cfg.batch % cfg.mini_batch == 0
    if not cfg.vanilla:
        assert spec is not None

    def _gen_images(g_params, z_list, rng, inject_noise=None, arrange=True,
                    arrangement=None):
        # ``arrange=False`` = the D step: the reference only re_arranges z in
        # generator_step (generator_trainer.py:415,419) — discriminator_step
        # feeds G iid z, so the D sees an uncorrelated fake distribution.
        styles = list(z_list)
        if arrange and not cfg.vanilla and spec is not None:
            if arrangement is not None:
                # randomized mode: per-step pair tables as arrays (no mixing
                # support, like RandomMiniBatchUtils :77-78)
                z = styles[0]
                chunks = [
                    apply_arrangement_z(
                        arrangement, z[k * cfg.mini_batch : (k + 1) * cfg.mini_batch]
                    )
                    for k in range(num_mini)
                ]
                styles = [jnp.concatenate(chunks, axis=0)]
            else:
                # arrangement applies within each mini-batch chunk
                chunks = [
                    re_arrange_z(spec, [z[k * cfg.mini_batch : (k + 1) * cfg.mini_batch] for z in styles])
                    for k in range(num_mini)
                ]
                styles = [
                    jnp.concatenate([c[i] for c in chunks], axis=0)
                    for i in range(len(styles))
                ]
        if (
            arrange
            and inject_noise is None
            and getattr(generator, "noise_mode", "normal") == "same_for_same_id"
            and not cfg.vanilla
            and spec is not None
        ):
            # explicit noise shared by same-id pairs (reference
            # generator_step :417-419 + re_arrange_inject_noise)
            from gan_control_tpu.latent.groups import re_arrange_inject_noise

            rng, k_inj = jax.random.split(rng)
            shapes = generator.noise_shapes(cfg.batch)
            noises = [
                jax.random.normal(jax.random.fold_in(k_inj, i), s)
                for i, s in enumerate(shapes)
            ]
            arranged = []
            for k in range(num_mini):
                chunk = [n[k * cfg.mini_batch : (k + 1) * cfg.mini_batch] for n in noises]
                if arrangement is not None:
                    arranged.append(apply_arrangement_noise(arrangement, chunk))
                else:
                    arranged.append(re_arrange_inject_noise(spec, chunk))
            inject_noise = [
                jnp.concatenate([arranged[k][i] for k in range(num_mini)], axis=0)
                for i in range(len(noises))
            ]
        inject_index = None
        if len(styles) > 1:
            # random mixing crossover layer (reference gan_model.py:763-764)
            rng, k_mix = jax.random.split(rng)
            inject_index = jax.random.randint(
                k_mix, (), 1, generator.n_latent
            )
        img, latent = generator.apply(
            g_params,
            styles,
            return_latents=True,
            inject_index=inject_index,
            noise=inject_noise,
            rngs={"noise": rng},
        )
        return img, latent

    # ---------------- discriminator ----------------

    def d_step(state: GANTrainState, real_img: jax.Array, z_list):
        rng, r_noise, r_aug1, r_aug2 = jax.random.split(state.rng, 4)
        fake_img, _ = _gen_images(state.g_params, z_list, r_noise, arrange=False)
        fake_img = jax.lax.stop_gradient(fake_img)
        if augment_fn is not None:
            fake_img = augment_fn(fake_img, state.ada_p, r_aug1)
            real_in = augment_fn(real_img, state.ada_p, r_aug2)
        else:
            real_in = real_img

        def loss_fn(d_params):
            # Two separate applies (not one vmapped 2x-batch graph): vmap's
            # folded conv batching measured ~6% faster standalone but its
            # larger conv workspace pushes the full d+g bench past 16GB HBM
            # at batch 16/512² bf16-no-remat; minibatch_stddev grouping also
            # must not straddle the fake/real boundary.
            fake_pred, _ = discriminator.apply(d_params, fake_img)
            real_pred, _ = discriminator.apply(d_params, real_in)
            mean_loss = d_logistic_loss(real_pred, fake_pred)
            # reference-exact gradient scale: discriminator_step divides
            # each mini-batch chunk's mean by the MINI-BATCH SIZE
            # (d_loss.div_(len(mini_real_img)), generator_trainer.py:658)
            # and ACCUMULATES over the num_mini chunks — total gradient =
            # num_mini * full_mean / mini_batch. Unlike the G and R1 steps
            # (which divide by the chunk COUNT), so the asymmetric adv:R1
            # magnitude ratio inside Adam's shared moments is replicated,
            # not "fixed"; the logged d_loss metric stays the interpretable
            # unscaled mean.
            num_mini = max(1, cfg.batch // cfg.mini_batch)
            scaled = mean_loss * (num_mini / cfg.mini_batch)
            return scaled, (mean_loss, real_pred, fake_pred)

        (_, (loss, real_pred, fake_pred)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.d_params)
        updates, d_opt_state = d_tx.update(grads, state.d_opt_state, state.d_params)
        d_params = optax.apply_updates(state.d_params, updates)
        r_t = jnp.mean(jnp.sign(real_pred))
        metrics = {
            "d_loss": loss,
            "real_score": real_pred.mean(),
            "fake_score": fake_pred.mean(),
            # ADA p adaptation statistic: sign of real logits (reference
            # :669-688 adjusts p from accumulated sign(real_pred)).
            "r_t": r_t,
        }
        ada_p = state.ada_p
        if cfg.ada_enabled and cfg.ada_p_fixed == 0:
            # adapt only in ADA mode; a configured fixed p stays fixed
            # (reference gates on augment['p'] == 0, :679)
            from gan_control_tpu.training.ada import ada_p_update

            ada_p = ada_p_update(
                ada_p, r_t, cfg.ada_target, real_img.shape[0], cfg.ada_length
            )
            metrics["ada_p"] = ada_p
        return (
            state.replace(
                d_params=d_params, d_opt_state=d_opt_state, rng=rng, ada_p=ada_p
            ),
            metrics,
        )

    def d_reg_step(state: GANTrainState, real_img: jax.Array):
        # R1 runs on UNAUGMENTED reals by design: the reference's
        # discriminator_regularize_step never calls augment() (reference
        # generator_trainer.py:699-706) — a deliberate deviation from
        # upstream rosinality, which augments the R1 forward. The split
        # only advances the key stream (kept for stream stability with
        # the committed convergence runs); the key itself is unused.
        rng, _unused_aug = jax.random.split(state.rng)

        def loss_fn(d_params):
            def logit(x):
                pred, _ = discriminator_reg.apply(d_params, x)
                return pred

            r1 = r1_penalty(logit, real_img)
            return cfg.r1 / 2.0 * r1 * cfg.d_reg_every, r1

        (loss, r1), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.d_params)
        updates, d_opt_state = d_tx.update(grads, state.d_opt_state, state.d_params)
        d_params = optax.apply_updates(state.d_params, updates)
        return (
            state.replace(d_params=d_params, d_opt_state=d_opt_state, rng=rng),
            {"d_r1_loss": r1},
        )

    # ---------------- generator ----------------

    def g_step(
        state: GANTrainState,
        z_list,
        predictor_params: Mapping[str, Any],
        inject_noise=None,
        arrangement: Arrangement | None = None,
    ):
        rng, r_noise, r_aug = jax.random.split(state.rng, 3)

        def loss_fn(g_params):
            img, _ = _gen_images(g_params, z_list, r_noise, inject_noise,
                                 arrangement=arrangement)
            d_in = img if augment_fn is None else augment_fn(img, state.ada_p, r_aug)
            fake_pred, _ = discriminator.apply(state.d_params, d_in)
            adv = g_nonsaturating_loss(fake_pred)
            metrics = {"g_adv_loss": adv}
            total = adv
            if attr_losses:
                attr_total, attr_metrics = _attr_losses_for_batch(
                    attr_losses, spec, predictor_params, img, num_mini,
                    remat=cfg.remat_predictors, arrangement=arrangement,
                    dtype=jnp.dtype(cfg.predictor_dtype),
                )
                total = total + attr_total
                metrics.update(attr_metrics)
            return total, metrics

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.g_params
        )
        updates, g_opt_state = g_tx.update(grads, state.g_opt_state, state.g_params)
        g_params = optax.apply_updates(state.g_params, updates)
        g_ema = ema_update(
            state.g_ema, g_params, ema_decay(cfg.batch, cfg.g_moving_average)
        )
        metrics["g_loss"] = loss
        return (
            state.replace(
                g_params=g_params,
                g_opt_state=g_opt_state,
                g_ema=g_ema,
                rng=rng,
                step=state.step + 1,
            ),
            metrics,
        )

    def g_reg_step(state: GANTrainState, z_list):
        rng, r_noise, r_path, r_mix = jax.random.split(state.rng, 4)
        inject_index = (
            jax.random.randint(r_mix, (), 1, generator.n_latent)
            if len(z_list) > 1 else None
        )

        def loss_fn(g_params):
            def synth(latent):
                img, _ = generator_reg.apply(
                    g_params,
                    [latent],
                    input_is_latent=True,
                    rngs={"noise": r_noise},
                )
                # float32 for the noise-product reduction: the path-length
                # statistic sums ~1e7 elements, which a bf16 accumulator
                # cannot do accurately under mixed precision
                return img.astype(jnp.float32)

            w_list = [
                generator.apply(g_params, z, method=type(generator).map_latent)
                for z in z_list
            ]
            if len(w_list) > 1:
                # style mixing in the reg step too (the reference forwards
                # mixing_noise's 1-or-2 styles with a random inject index,
                # generator_trainer.py:574): layers < inject_index take
                # style 0, the rest style 1
                layer = jnp.arange(generator.n_latent)[None, :, None]
                latent = jnp.where(
                    layer < inject_index,
                    w_list[0][:, None, :],
                    w_list[1][:, None, :],
                )
            else:
                latent = jnp.repeat(
                    w_list[0][:, None, :], generator.n_latent, axis=1
                )
            penalty, new_mean, path_lengths = path_length_penalty(
                synth, latent, r_path, state.mean_path_length
            )
            weighted = cfg.path_regularize * cfg.g_reg_every * penalty
            return weighted, (penalty, new_mean, path_lengths)

        (loss, (penalty, new_mean, path_lengths)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.g_params)
        updates, g_opt_state = g_tx.update(grads, state.g_opt_state, state.g_params)
        g_params = optax.apply_updates(state.g_params, updates)
        # reference EMA timing: accumulate happens ONCE per iteration AFTER
        # the reg step (generator_trainer.py:366-369), so the EMA must see
        # the reg-updated params. g_step already blended e' = d*e +
        # (1-d)*p_pre; adding (1-d)*(p_post - p_pre) here lands exactly on
        # the reference's d*e + (1-d)*p_post without a second decay.
        one_minus_d = 1.0 - ema_decay(cfg.batch, cfg.g_moving_average)
        g_ema = jax.tree_util.tree_map(
            lambda e, pn, po: e + one_minus_d * (pn - po),
            state.g_ema, g_params, state.g_params,
        )
        metrics = {
            "g_path_loss": penalty,
            "g_path_length": path_lengths.mean(),
            "g_mean_path_length": new_mean,
        }
        return (
            state.replace(
                g_params=g_params,
                g_opt_state=g_opt_state,
                g_ema=g_ema,
                mean_path_length=new_mean,
                rng=rng,
            ),
            metrics,
        )

    return {
        "d_step": d_step,
        "d_reg_step": d_reg_step,
        "g_step": g_step,
        "g_reg_step": g_reg_step,
    }
