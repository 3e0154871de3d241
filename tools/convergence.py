"""Convergence harness: demonstrates the phase-1 loop actually LEARNS.

Every other test in the suite asserts mechanics (finiteness, shapes, parity
vs torch oracles); this harness is the repo's answer to the reference's
de-facto regression test — FID / separability tracked continuously during
real training (reference trainers/generator_trainer.py:728-748,
configs/ffhq.json evaluation_config) — shrunk to a distribution that is
learnable in minutes on a CPU mesh:

  Blob world: 32x32 images of one Gaussian blob whose COLOR and POSITION
  are the controlled attributes. The latent is split into two groups
  (color, position) exactly like the FFHQ id/orientation/... split, and two
  deterministic, differentiable toy "predictors" (intensity-weighted mean
  color; intensity centroid) play the role of the frozen ArcFace/Hopenet
  battery, closing the same contrastive-disentanglement loop end to end
  through the REAL GeneratorTrainer (trainer loop, jitted SPMD steps,
  contrastive criterion, group arrangement, EMA).

What a healthy run must show, measured at eval checkpoints and written as
one JSONL line each:

  (a) learning: a pixel-statistics FID proxy (Frechet distance over 8x8
      mean-pooled pixel features) drops vs initialization, and the D
      logistic loss drops from its untrained value (D separating real
      from fake — the adversarial signal engaging);
  (b) disentanglement: the ratio of toy-predictor feature distances between
      SAME-group pairs (pairs sharing that group's sub-latent) and
      NOT-SAME pairs collapses from ~1 (untrained G ignores the latent
      split) toward 0 — the contrastive mechanism visibly engaging;
  (c) EMA: the EMA generator's FID proxy improves too and its ratios track
      the live generator's (the reference accumulates EMA every iteration,
      generator_trainer.py:366-369).

Usage:  python tools/convergence.py [--iters 600] [--eval-every 100]
                                    [--out /tmp/convergence.jsonl]

The committed reference run lives in tools/results/convergence_run.jsonl;
tests/test_convergence.py runs the same harness (fewer iters) in the suite.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

SIZE = 32
STYLE_DIM = 64
BATCH = 8
# blob std in normalized coords; positions keep the blob inside the frame
BLOB_SIGMA = 0.12
POS_LO, POS_HI = 0.25, 0.75


# ---------------------------------------------------------------------------
# Blob world: the synthetic learnable distribution
# ---------------------------------------------------------------------------


def render_blobs(colors: np.ndarray, positions: np.ndarray, size: int = SIZE) -> np.ndarray:
    """[N,3] colors in [0,1] + [N,2] positions in [0,1] -> NHWC images in
    [-1,1]: background -1, blob pixels ramp to the (scaled) color."""
    n = colors.shape[0]
    coords = (np.arange(size, dtype=np.float32) + 0.5) / size
    yy, xx = np.meshgrid(coords, coords, indexing="ij")
    d2 = (yy[None] - positions[:, 0, None, None]) ** 2 + (
        xx[None] - positions[:, 1, None, None]
    ) ** 2
    g = np.exp(-d2 / (2.0 * BLOB_SIGMA**2)).astype(np.float32)  # [N,H,W]
    img = -1.0 + 2.0 * g[..., None] * colors[:, None, None, :]
    return img.astype(np.float32)


def sample_blob_params(rng: np.random.Generator, n: int):
    colors = rng.uniform(0.0, 1.0, (n, 3)).astype(np.float32)
    positions = rng.uniform(POS_LO, POS_HI, (n, 2)).astype(np.float32)
    return colors, positions


def blob_loader(batch: int, seed: int = 0):
    rng = np.random.default_rng(seed)
    while True:
        colors, positions = sample_blob_params(rng, batch)
        yield render_blobs(colors, positions)


# ---------------------------------------------------------------------------
# Toy predictors: deterministic differentiable attribute extractors
# ---------------------------------------------------------------------------


def _intensity(images):
    """Per-pixel luminance of (img+1)/2, clipped >= 0 (an untrained G emits
    values below -1; negative weights would destabilize the normalizers)."""
    import jax.numpy as jnp

    return jnp.maximum(jnp.mean(images + 1.0, axis=-1) * 0.5, 0.0)  # [N,H,W]


def color_feature(images):
    """Intensity-weighted mean color, ~ 0.5 * blob color on real blobs
    (the weighting constant cancels between same/not-same distances)."""
    import jax.numpy as jnp

    w = _intensity(images)[..., None]  # [N,H,W,1]
    rgb = jnp.maximum((images + 1.0) * 0.5, 0.0)
    return jnp.sum(rgb * w, axis=(1, 2)) / (jnp.sum(w, axis=(1, 2)) + 1e-4)


def position_feature(images):
    """Intensity centroid in normalized [0,1]^2 coords, = blob position on
    real blobs."""
    import jax.numpy as jnp

    w = _intensity(images)  # [N,H,W]
    size = images.shape[1]
    coords = (jnp.arange(size, dtype=jnp.float32) + 0.5) / size
    denom = jnp.sum(w, axis=(1, 2)) + 1e-4
    cy = jnp.sum(w * coords[None, :, None], axis=(1, 2)) / denom
    cx = jnp.sum(w * coords[None, None, :], axis=(1, 2)) / denom
    return jnp.stack([cy, cx], axis=-1)


def make_toy_attr_losses():
    """Two AttributeLossSpecs closing the contrastive loop through the toy
    predictors (the blob-world stand-ins for the FFHQ battery). Thresholds
    are set from the blob distribution's feature-distance scales:
    E||c1-c2||^2 ~ 0.125 for the (0.5-scaled) colors, ~0.12 for positions."""
    from gan_control_tpu.losses.contrastive import ContrastiveConfig, pairwise_sq_l2
    from gan_control_tpu.training.train_step import AttributeLossSpec

    def cfg(lower, upper):
        return ContrastiveConfig(
            intermediate_weights=(),
            last_layer_weight=10.0,
            lower_thres=(),
            upper_thres=(),
            last_lower_thres=lower,
            last_upper_thres=upper,
            focus_on=("same_as_last_layer",),
        )

    specs = (
        AttributeLossSpec(
            name="color_loss",
            group="color",
            cfg=cfg(0.002, 0.05),
            feature_fn=lambda pp, images: [color_feature(images)],
            dist_fn=pairwise_sq_l2,
            pair_dist_fn=pairwise_sq_l2,
        ),
        AttributeLossSpec(
            name="position_loss",
            group="position",
            cfg=cfg(0.002, 0.04),
            feature_fn=lambda pp, images: [position_feature(images)],
            dist_fn=pairwise_sq_l2,
            pair_dist_fn=pairwise_sq_l2,
        ),
    )
    params = {"color_loss": {}, "position_loss": {}}
    return specs, params


def toy_config(iters: int, seed: int = 0, random_mode: bool = False,
               ada: bool = False, bf16: bool = False) -> dict:
    """Tiny blob-world config: 32x32, 2 latent groups, split_fc mapping —
    the FFHQ schema (configs/ffhq.json) shrunk to CPU scale.

    ``random_mode`` switches to mini_batch_mode='random' (the reference's
    RandomMiniBatchUtils: a FRESH random group slot placement every step,
    fed into one compiled g_step as Arrangement arrays), so the harness
    also proves the contrastive_loss_masked path LEARNS.

    ``ada`` enables adaptive discriminator augmentation (p=0 -> adapt
    toward ada_target from sign(real logits), reference
    generator_trainer.py:669-688) with a short ada_length so the
    adaptation is visible within the run — evidencing the non-leaking
    augmentation pipeline ENGAGES during learning, not just in oracles.

    ``bf16`` turns on the shipped mixed-precision plan
    (model_config.mixed_precision, utils/precision.py roles) so a
    real-chip run evidences the bf16 TRAINING path converging on
    hardware, not just staying finite."""
    sub_groups = {
        "color": {"place_in_mini_batch": [0, 4], "place_in_latent": [0, 32]},
        "position": {"place_in_mini_batch": [4, 8], "place_in_latent": [32, 64]},
    }
    if random_mode:
        for g in sub_groups.values():
            g["count_in_mini_bach"] = [2, 6]
    return {
        "save_name": "convergence",
        "add_weight_to_name": False,
        "model_config": {
            "vanilla": False,
            "img_channels": 3,
            "split_fc": True,
            "marge_fc": False,
            "latent_size": STYLE_DIM,
            "size": SIZE,
            "n_mlp": 2,
            "channel_multiplier": 0.5,
            "max_channels": 64,
            "g_noise_mode": "normal",
            "mixed_precision": bf16,
        },
        "training_config": {
            "debug": False,
            "iter": iters,
            "start_iter": 0,
            "seed": seed,
            "batch": BATCH,
            "mini_batch": BATCH,
            "mini_batch_mode": "random" if random_mode else "normal",
            "augment": (
                {"enabled": True, "p": 0, "ada_target": 0.6,
                 "ada_length": 5000}
                if ada else {"enabled": False}
            ),
            "sub_groups_dict": sub_groups,
            "r1": 1,
            "d_every": 1,
            "g_reg_every": 4,
            "d_reg_every": 16,
            "lr_g": 0.003,
            "lr_d": 0.003,
            "g_moving_average": 100,
            "path_regularize": 2,
            "path_batch_shrink": 2,
            "mixing": 0,
        },
        "data_config": {"data_set_name": "synthetic", "path": ""},
        "evaluation_config": {
            "fid": {"enabled": False},
            "separability": {"enabled": False},
        },
        "tensorboard_config": {"enabled": False},
        "monitor_config": {"enabled": False},
        "ckpt_config": {"enabled": False, "ckpt": "no_ckpt"},
    }


# ---------------------------------------------------------------------------
# Measurements
# ---------------------------------------------------------------------------


def _pixel_feats(images: np.ndarray) -> np.ndarray:
    """8x8 mean-pooled pixel features (N, 192): the FID-proxy feature space
    (pixel statistics, no learned net — meaningful with random weights)."""
    n, h, w, c = images.shape
    f = images.reshape(n, 8, h // 8, 8, w // 8, c).mean(axis=(2, 4))
    return f.reshape(n, -1).astype(np.float64)


def frechet_pixel_distance(feats_a: np.ndarray, feats_b: np.ndarray) -> float:
    """Frechet distance between Gaussian fits of two pixel-feature sets
    (evaluation/fid.py's formula on pixel stats instead of InceptionV3
    pools). Deliberately NOT fid.frechet_distance itself: untrained blob
    images have near-constant features, so the covariances here are
    routinely degenerate — an unconditional 1e-6 ridge + take-the-real-
    part keeps the proxy total where the FID path prefers to raise
    (a bogus best-FID checkpoint matters there; a proxy curve doesn't).
    The matrix sqrt is shared (fid._sqrtm_psd: scipy when present,
    eigendecomposition fallback otherwise)."""
    from gan_control_tpu.evaluation.fid import _sqrtm_psd

    mu_a, mu_b = feats_a.mean(0), feats_b.mean(0)
    cov_a = np.cov(feats_a, rowvar=False) + 1e-6 * np.eye(feats_a.shape[1])
    cov_b = np.cov(feats_b, rowvar=False) + 1e-6 * np.eye(feats_b.shape[1])
    covmean = _sqrtm_psd(cov_a @ cov_b)
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    d2 = np.sum((mu_a - mu_b) ** 2) + np.trace(cov_a + cov_b - 2.0 * covmean)
    return float(max(d2, 0.0))


@dataclasses.dataclass
class Evaluator:
    """Fixed eval batches + jitted samplers, reused across checkpoints."""

    generator: object
    n_eval: int = 256

    def __post_init__(self):
        import jax

        rng = np.random.default_rng(123)
        colors, positions = sample_blob_params(rng, self.n_eval)
        self.real_feats = _pixel_feats(render_blobs(colors, positions))
        # paired latents: zB shares zA's group sub-latent for the "same"
        # leg and keeps its own draw for the "not-same" leg
        self.zA = rng.standard_normal((self.n_eval, STYLE_DIM)).astype(np.float32)
        self.zB = rng.standard_normal((self.n_eval, STYLE_DIM)).astype(np.float32)
        gen = self.generator

        @jax.jit
        def sample(g_params, z, noise_key):
            img, _ = gen.apply(g_params, [z], rngs={"noise": noise_key})
            return img

        self._sample = sample
        self._noise_key = jax.random.PRNGKey(99)

    def _gen(self, g_params, z: np.ndarray) -> np.ndarray:
        import jax

        out = []
        for s in range(0, z.shape[0], 64):
            k = jax.random.fold_in(self._noise_key, s)
            out.append(np.asarray(self._sample(g_params, z[s : s + 64], k)))
        return np.concatenate(out, 0)

    def ratios(self, g_params, imgs_a: np.ndarray | None = None) -> dict:
        """Same/not-same toy-feature distance ratios per group.

        ``imgs_a``: pass a cached zA sweep to skip regenerating it
        (numerically identical — _gen's injection noise is keyed only on
        the chunk offset)."""
        import jax.numpy as jnp

        if imgs_a is None:
            imgs_a = self._gen(g_params, self.zA)
        imgs_not = self._gen(g_params, self.zB)  # group-independent
        res = {}
        for gname, (lo, hi), feat in (
            ("color", (0, 32), color_feature),
            ("position", (32, 64), position_feature),
        ):
            z_same = self.zB.copy()
            z_same[:, lo:hi] = self.zA[:, lo:hi]
            imgs_same = self._gen(g_params, z_same)
            fa = np.asarray(feat(jnp.asarray(imgs_a)))
            fs = np.asarray(feat(jnp.asarray(imgs_same)))
            fn_ = np.asarray(feat(jnp.asarray(imgs_not)))
            d_same = float(np.mean(np.sum((fa - fs) ** 2, -1)))
            d_not = float(np.mean(np.sum((fa - fn_) ** 2, -1)))
            res[f"{gname}_same_dist"] = d_same
            res[f"{gname}_not_same_dist"] = d_not
            res[f"{gname}_ratio"] = d_same / max(d_not, 1e-9)
        return res

    def fid_proxy(self, g_params, imgs: np.ndarray | None = None) -> float:
        if imgs is None:
            imgs = self._gen(g_params, self.zA)
        return frechet_pixel_distance(self.real_feats, _pixel_feats(imgs))

    def checkpoint(self, state, it: int, d_loss_recent: float | None) -> dict:
        # one zA sweep per params set, shared by fid_proxy and ratios
        # (was 2x before; imgs_not is likewise hoisted out of the group
        # loop inside ratios — on --platform tpu these are real chip time)
        imgs_live = self._gen(state.g_params, self.zA)
        imgs_ema = self._gen(state.g_ema, self.zA)
        rec = {"iter": it,
               "fid_proxy": self.fid_proxy(state.g_params, imgs_live),
               "ema_fid_proxy": self.fid_proxy(state.g_ema, imgs_ema)}
        rec.update(self.ratios(state.g_params, imgs_live))
        ema = self.ratios(state.g_ema, imgs_ema)
        rec.update({f"ema_{k}": v for k, v in ema.items()})
        if d_loss_recent is not None:
            rec["d_loss_recent"] = d_loss_recent
        return rec


# ---------------------------------------------------------------------------
# The run
# ---------------------------------------------------------------------------


def run(iters: int = 600, eval_every: int = 100, seed: int = 0,
        out_path: str | None = None, random_mode: bool = False,
        ada: bool = False, bf16: bool = False) -> list[dict]:
    """Train blob world through the REAL GeneratorTrainer; returns the eval
    records (first = initialization, last = final)."""
    from gan_control_tpu.trainers.generator_trainer import GeneratorTrainer

    specs, params = make_toy_attr_losses()
    trainer = GeneratorTrainer(
        config=toy_config(iters, seed, random_mode=random_mode, ada=ada,
                          bf16=bf16),
        init_dirs=False,
        attr_losses=specs,
        predictor_params=params,
        data_loader=blob_loader(BATCH, seed=seed + 1),
    )
    ev = Evaluator(trainer.generator)

    records: list[dict] = []
    d_losses: list[float] = []
    out = open(out_path, "w") if out_path else None

    def emit(rec):
        records.append(rec)
        line = json.dumps({k: round(v, 5) if isinstance(v, float) else v
                           for k, v in rec.items()})
        print(line, flush=True)
        if out:
            out.write(line + "\n")
            out.flush()

    emit(ev.checkpoint(trainer.state, 0, None))
    t0 = time.time()
    for i in range(iters):
        metrics = trainer.one_iteration(i)
        d_losses.append(float(metrics["d_loss"]))
        if (i + 1) % eval_every == 0:
            recent = float(np.mean(d_losses[-min(50, len(d_losses)):]))
            rec = ev.checkpoint(trainer.state, i + 1, recent)
            rec["seconds"] = round(time.time() - t0, 1)
            if "ada_p" in metrics:
                rec["ada_p"] = float(metrics["ada_p"])
            emit(rec)
    if out:
        out.close()
    return records


def verdict(records: list[dict]) -> dict:
    """The convergence claims, as booleans (the test asserts these)."""
    first, last = records[0], records[-1]
    # None (JSON null), not inf: json.dumps would emit bare `Infinity`,
    # which strict JSON parsers reject in the output .jsonl
    d_first = records[1].get("d_loss_recent") if len(records) > 1 else None
    d_last = last.get("d_loss_recent")
    init_untrained_d = 2.0 * float(np.log(2.0))  # logistic loss of a blind D
    ada = (
        # adaptation engaged: p moved off its 0 start (the blob D overfits
        # fast, so sign(real logits) drives p UP toward ada_target)
        {"ada_p_final": round(last["ada_p"], 4), "ada_adapted": last["ada_p"] > 0}
        if "ada_p" in last
        else {}
    )
    return ada | {
        "fid_proxy_improved": last["fid_proxy"] < 0.5 * first["fid_proxy"],
        "ema_fid_proxy_improved": last["ema_fid_proxy"] < 0.5 * first["ema_fid_proxy"],
        "d_below_untrained": d_last is not None and d_last < init_untrained_d,
        "color_disentangled": last["color_ratio"] < 0.5 * max(first["color_ratio"], 1e-9)
        and last["color_ratio"] < 0.5,
        "position_disentangled": last["position_ratio"]
        < 0.5 * max(first["position_ratio"], 1e-9)
        and last["position_ratio"] < 0.5,
        "ema_tracks": last["ema_color_ratio"] < 0.5
        and last["ema_position_ratio"] < 0.5,
        "init_fid_proxy": round(first["fid_proxy"], 4),
        "final_fid_proxy": round(last["fid_proxy"], 4),
        "d_loss_first_window": None if d_first is None else round(d_first, 4),
        "d_loss_last_window": None if d_last is None else round(d_last, 4),
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=600)
    ap.add_argument("--eval-every", type=int, default=100)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--random-mode", action="store_true",
                    help="mini_batch_mode='random' (per-step Arrangement "
                         "arrays through the masked contrastive path)")
    ap.add_argument("--ada", action="store_true",
                    help="enable adaptive discriminator augmentation "
                         "(short ada_length so the p adaptation is visible)")
    ap.add_argument("--bf16", action="store_true",
                    help="train under the shipped mixed-precision plan "
                         "(pairs with --platform tpu: bf16 convergence on "
                         "real hardware)")
    ap.add_argument("--platform", choices=["cpu", "tpu"], default="cpu",
                    help="cpu (default; blob world is CPU-scale and "
                         "deterministic there) or tpu: leave the box's "
                         "pinned TPU backend active and use its compile "
                         "cache — evidences convergence on real silicon")
    ap.add_argument("--out", default="/tmp/convergence.jsonl")
    args = ap.parse_args()

    import jax

    if args.platform == "cpu":
        # Force the CPU platform WITHOUT probing jax.default_backend()
        # first: the probe initializes the box's pinned remote-TPU backend,
        # which blocks on the tunnel when the chip is busy — the CPU
        # harness never needs it
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
    else:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    records = run(args.iters, args.eval_every, args.seed, args.out,
                  random_mode=args.random_mode, ada=args.ada, bf16=args.bf16)
    v = verdict(records)
    if args.ada and "ada_adapted" not in v:
        # --ada was the point: if no eval record carried ada_p (e.g.
        # iters < eval-every), fail instead of silently passing
        v["ada_adapted"] = False
    print(json.dumps(v), flush=True)
    if args.out:
        with open(args.out, "a") as f:
            f.write(json.dumps(v) + "\n")
    ok = all(bool(x) for k, x in v.items() if isinstance(x, bool))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
