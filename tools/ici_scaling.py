"""ICI collective accounting for the data-parallel phase-1 step.

Usage:  python tools/ici_scaling.py   (self-hosts an 8-device CPU mesh)

TRAINING.md's measured roofline concludes the single-chip 512² train
path is saturated and names data parallelism as the remaining system
lever (the reference scales the same way: batch over 4 GPUs with
nn.DataParallel, reference README.md:70 + trainers/generator_trainer.py
wrapping every module in DataParallel). This tool grounds that claim in
the compiled programs instead of hand-waving:

Part A (structural, executed): jit the four sharded train executables on
2/4/8-device meshes with the trainer's real shardings (batch over
'data', params replicated), parse the post-partitioning HLO for
collective ops, and sum the bytes each moves. The check: the SPMD
partitioner's cross-chip traffic is gradient all-reduces plus O(KB)
extras (metric scalars, the cross-device minibatch-stddev reduce, the
contrastive feature all-gather when a latent group spans devices) —
no activation-sized tensors cross the mesh. Measured detail: the
emitted all-reduce bytes run ~1.7-2.2x the minimal one-reduce-per-
gradient bytes because a param used in several forwards (D sees real
AND fake; G's style MLP feeds every layer) gets each use-site's partial
gradient reduced separately; the projection in Part B carries that
measured ratio rather than the naive minimum.

Part B (analytic, exact): param byte counts for the flagship FFHQ-512
models via jax.eval_shape (no compile, no chip), combined with the
committed single-chip cadence (TRAINING.md: 480 ms/iter at batch 16) and
the v5e ICI figure, projecting weak- and strong-scaling efficiency at
2/4/8/16 chips with a NON-overlapped ring all-reduce as the worst case.

Writes tools/results/ici_scaling.json; the committed table lives in
TRAINING.md "Scaling over ICI".
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

# v5e ICI: 1,600 Gbps aggregate interconnect per chip (Google Cloud v5e
# spec sheet) = 200 GB/s across the 2D-torus links; a 1-D ring all-reduce
# rides ONE torus axis in both directions, ~90 GB/s of that aggregate
# (2 x 45 GB/s per-link one-way, jax-ml.github.io/scaling-book figures).
ICI_RING_BW = 9.0e10  # bytes/s, bidirectional, one torus axis
SINGLE_CHIP_MS_PER_ITER = 480.0  # TRAINING.md measured cadence, batch 16
BATCH_PER_CHIP = 16

_DTYPE_BYTES = {
    "f64": 8, "f32": 4, "f16": 2, "bf16": 2, "f8e4m3fn": 1, "f8e5m2": 1,
    "s64": 8, "u64": 8, "s32": 4, "u32": 4, "s16": 2, "u16": 2,
    "s8": 1, "u8": 1, "pred": 1, "c64": 8, "c128": 16,
}

# `f32[16,32]` / `bf16[]` inside an HLO result shape (layout braces and
# tuple parens are stripped before matching)
_SHAPE_RE = re.compile(r"([a-z0-9]+)\[([0-9,]*)\]")

# `%name = SHAPE all-reduce(...)`; async pairs count the -start only
# (the -done carries the same shape and would double-count). Tuple
# shapes carry `/*index=N*/` comments and, in TPU HLO, layouts with
# parens (`{1,0:T(8,128)}`), so allow one nesting level of parens.
_COLLECTIVE_RE = re.compile(
    r"=\s*(\((?:[^()]|\([^()]*\))*\)|[a-z0-9]+\[[^\]]*\](?:\{[^}]*\})?)\s*"
    r"(all-reduce-start|all-reduce|all-gather-start|all-gather|"
    r"reduce-scatter|collective-permute-start|collective-permute)\("
)


def _shape_bytes(shape_text: str) -> int:
    total = 0
    for dtype, dims in _SHAPE_RE.findall(shape_text):
        if dtype not in _DTYPE_BYTES:  # e.g. token[] — no data moved
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES[dtype]
    return total


def collective_bytes(hlo_text: str) -> dict[str, int]:
    """Sum bytes moved per collective kind in post-partitioning HLO."""
    out: dict[str, int] = {}
    for shape_text, op in _COLLECTIVE_RE.findall(hlo_text):
        kind = op.replace("-start", "")
        b = _shape_bytes(shape_text)
        if (op in ("all-gather-start", "collective-permute-start")
                and shape_text.startswith("(")):
            # these async -start shapes pair (operand, result[, ctx]):
            # counting the whole tuple would double the data actually
            # moved. all-reduce-start is NOT halved — its shape is the
            # result alone (tuple = variadic results, all real traffic).
            b //= 2
        out[kind] = out.get(kind, 0) + b
    return out


def tree_bytes(tree) -> int:
    import jax

    return sum(
        int(np.prod(x.shape)) * x.dtype.itemsize
        for x in jax.tree_util.tree_leaves(tree)
        if hasattr(x, "shape")
    )


def build_small_steps(batch: int):
    """The tiny train-step setup the suite uses (tests/test_train_step.py)."""
    import jax.numpy as jnp

    from gan_control_tpu.latent.groups import GroupSpec, LatentGroup
    from gan_control_tpu.losses.contrastive import (
        ContrastiveConfig,
        pairwise_sq_l2,
    )
    from gan_control_tpu.models.discriminator import Discriminator
    from gan_control_tpu.models.generator import Generator
    from gan_control_tpu.training.state import (
        init_gan_state,
        make_gan_optimizers,
    )
    from gan_control_tpu.training.train_step import (
        AttributeLossSpec,
        TrainStepConfig,
        make_train_steps,
    )

    size, style, mini_batch = 16, 64, 8
    spec = GroupSpec(
        groups=(
            LatentGroup("id", 0, 32, mb_start=0, mb_end=4),
            LatentGroup("other", 32, 64, mb_start=4, mb_end=8),
        ),
        mini_batch=mini_batch,
        style_dim=style,
    )
    gen = Generator(size=size, style_dim=style, n_mlp=2, split_fc=True,
                    fc_groups=spec.fc_dims(), max_channels=32)
    disc = Discriminator(size=size, max_channels=32)
    g_tx, d_tx = make_gan_optimizers(
        {"lr_g": 2e-3, "lr_d": 2e-3, "g_reg_every": 4, "d_reg_every": 16}
    )
    cfg = TrainStepConfig(batch=batch, mini_batch=mini_batch, style_dim=style)

    def fake_features(params, images):
        del params
        return [jnp.mean(images.reshape(images.shape[0], 4, -1), axis=2),
                jnp.mean(images, axis=(1, 2))]

    attr = (
        AttributeLossSpec(
            name="embedding_loss",
            group="id",
            cfg=ContrastiveConfig(
                intermediate_weights=(0.0,),
                last_layer_weight=1.0,
                lower_thres=(0.1,),
                upper_thres=(0.5,),
                last_lower_thres=0.1,
                last_upper_thres=1.0,
                focus_on=("not_same_as_last_layer", "same_as_last_layer"),
            ),
            feature_fn=fake_features,
            dist_fn=pairwise_sq_l2,
        ),
    )
    steps = make_train_steps(gen, disc, cfg, spec=spec, attr_losses=attr,
                             g_tx=g_tx, d_tx=d_tx)
    import jax

    state = init_gan_state(gen, disc, g_tx, d_tx, jax.random.PRNGKey(0),
                           style_dim=style)
    return steps, state, cfg, size, style


def measure_collectives(n_devices: int, batch: int) -> dict:
    """Compile the four sharded executables on an n-device mesh and
    return the per-executable collective-bytes breakdown."""
    import jax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    if len(jax.devices()) < n_devices:
        raise RuntimeError(
            f"need {n_devices} devices, backend has {len(jax.devices())} "
            "(run via `python tools/ici_scaling.py` so the 8-device CPU "
            "flag is set before jax initializes)"
        )
    steps, state, cfg, size, style = build_small_steps(batch)
    mesh = Mesh(np.array(jax.devices()[:n_devices]), ("data",))
    batch_sharding = NamedSharding(mesh, P("data"))
    replicated = NamedSharding(mesh, P())

    state = jax.device_put(state, replicated)
    real = jax.device_put(
        np.zeros((batch, size, size, 3), np.float32), batch_sharding
    )
    z = jax.device_put(
        np.zeros((batch, style), np.float32), batch_sharding
    )
    # The path batch must be device_put with the batch sharding, exactly
    # as the trainer does (generator_trainer.py:361-364 via
    # _sample_z/_put_global_rows). Slicing the sharded `z` host-side
    # (`z[:path_batch]`) hands jit an array whose sharding the slice
    # destroyed — the lowered program then runs UNPARTITIONED and emits
    # zero collectives, which is what the (confirmed-buggy) r04 artifact
    # recorded for g_reg_step.
    path_batch = max(batch // cfg.path_batch_shrink, n_devices)
    z_path = jax.device_put(
        np.zeros((path_batch, style), np.float32), batch_sharding
    )
    pred_params = {"embedding_loss": {}}

    lowered = {
        "d_step": jax.jit(steps["d_step"]).lower(state, real, (z,)),
        "g_step": jax.jit(steps["g_step"]).lower(state, (z,), pred_params),
        "d_reg_step": jax.jit(steps["d_reg_step"]).lower(state, real),
        "g_reg_step": jax.jit(steps["g_reg_step"]).lower(state, (z_path,)),
    }
    out = {
        "n_devices": n_devices,
        "batch": batch,
        "d_param_bytes": tree_bytes(state.d_params),
        "g_param_bytes": tree_bytes(state.g_params),
        "per_step": {},
    }
    for name, low in lowered.items():
        hlo = low.compile().as_text()
        out["per_step"][name] = collective_bytes(hlo)
    return out


def flagship_param_bytes() -> dict[str, int]:
    """Exact FFHQ-512 G/D param bytes via eval_shape (no compile)."""
    import jax
    import jax.numpy as jnp

    from gan_control_tpu.latent.groups import GroupSpec
    from gan_control_tpu.models.discriminator import Discriminator
    from gan_control_tpu.models.generator import Generator

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from __graft_entry__ import FFHQ_GROUPS

    spec = GroupSpec.from_config(FFHQ_GROUPS, mini_batch=16)
    gen = Generator(size=512, style_dim=512, n_mlp=8, split_fc=True,
                    fc_groups=spec.fc_dims())
    disc = Discriminator(size=512)
    z = jnp.zeros((2, 512))
    img = jnp.zeros((2, 512, 512, 3))
    g_shapes = jax.eval_shape(
        lambda: gen.init({"params": jax.random.PRNGKey(0),
                          "noise": jax.random.PRNGKey(1)}, [z])
    )
    d_shapes = jax.eval_shape(lambda: disc.init(jax.random.PRNGKey(2), img))
    return {"g": tree_bytes(g_shapes), "d": tree_bytes(d_shapes)}


def ring_allreduce_s(bytes_: float, n: int, bw: float = ICI_RING_BW) -> float:
    """Non-overlapped bidirectional ring all-reduce time (worst case:
    XLA normally overlaps the grad all-reduce with backward compute)."""
    if n <= 1:
        return 0.0
    return 2.0 * (n - 1) / n * bytes_ / bw


def project_scaling(
    pb: dict[str, int], traffic_ratio: float = 1.0
) -> list[dict]:
    """Weak (batch 16/chip) + strong (global batch 16) scaling model.

    traffic_ratio scales the minimal one-reduce-per-gradient traffic to
    what the partitioner actually emits (Part A measures ~2.2x for
    d_step, ~1.7x for g_step: a param used in BOTH the real and fake D
    forwards gets its two partial gradients all-reduced separately)."""
    # cadence-amortized all-reduce bytes/iter: every d_step reduces D
    # grads, every g_step reduces G grads, + the reg steps at 1/16, 1/4
    ar_bytes = (pb["d"] * (1 + 1 / 16) + pb["g"] * (1 + 1 / 4)) * traffic_ratio
    rows = []
    for n in (1, 2, 4, 8, 16):
        t_ar = ring_allreduce_s(ar_bytes, n) * 1e3  # ms
        weak_iter = SINGLE_CHIP_MS_PER_ITER + t_ar
        weak_imgs = BATCH_PER_CHIP * n / (weak_iter / 1e3)
        # strong: global batch 16 split n ways; per-chip compute shrinks
        # ~linearly (activations dominate at 512²), AR term does not
        strong_iter = SINGLE_CHIP_MS_PER_ITER / n + t_ar
        strong_imgs = BATCH_PER_CHIP / (strong_iter / 1e3)
        rows.append({
            "chips": n,
            "allreduce_ms": round(t_ar, 2),
            "weak_ms_per_iter": round(weak_iter, 1),
            "weak_imgs_per_s": round(weak_imgs, 1),
            "weak_efficiency": round(
                weak_imgs / (n * BATCH_PER_CHIP / (SINGLE_CHIP_MS_PER_ITER / 1e3)), 4
            ),
            "strong_ms_per_iter": round(strong_iter, 1),
            "strong_imgs_per_s": round(strong_imgs, 1),
        })
    return rows


def main():
    import jax

    results = {"collectives": [], "flagship_param_bytes": None,
               "projection": None}
    for n in (2, 4, 8):
        r = measure_collectives(n, batch=16)
        results["collectives"].append(r)
        per = r["per_step"]
        print(f"n={n}: d_step collectives {per['d_step']} "
              f"(D grads = {r['d_param_bytes']} B), "
              f"g_step {per['g_step']} (G grads = {r['g_param_bytes']} B)")

    pb = flagship_param_bytes()
    results["flagship_param_bytes"] = pb
    print(f"flagship FFHQ-512 params: G={pb['g']/1e6:.1f} MB "
          f"D={pb['d']/1e6:.1f} MB (f32 grads)")

    # measured emitted-traffic / minimal-gradient-bytes ratio (see
    # project_scaling docstring); take the worst over the measured meshes
    # and over ALL FOUR executables — the r04 artifact only sampled
    # d_step/g_step and so missed that g_reg_step (path-length penalty:
    # double grad through G) emits the largest per-step ratio.
    ratios = []
    for r in results["collectives"]:
        for step, denom in (("d_step", "d_param_bytes"),
                            ("d_reg_step", "d_param_bytes"),
                            ("g_step", "g_param_bytes"),
                            ("g_reg_step", "g_param_bytes")):
            ar = r["per_step"][step].get("all-reduce", 0)
            assert ar > 0, (
                f"{step} emitted ZERO all-reduce bytes on a {r['n_devices']}-"
                "device mesh — the input sharding was destroyed before jit "
                "(the r04 bug); refusing to write a bogus artifact"
            )
            ratios.append(ar / r[denom])
    traffic_ratio = max(ratios)
    results["traffic_ratio"] = round(traffic_ratio, 3)
    print(f"emitted/minimal gradient-traffic ratio: {traffic_ratio:.2f}x")

    rows = project_scaling(pb, traffic_ratio)
    results["projection"] = rows
    print(f"{'chips':>5} {'AR ms':>7} {'weak ms/it':>10} {'weak img/s':>10} "
          f"{'eff':>6} {'strong ms/it':>12} {'strong img/s':>12}")
    for row in rows:
        print(f"{row['chips']:>5} {row['allreduce_ms']:>7.2f} "
              f"{row['weak_ms_per_iter']:>10.1f} "
              f"{row['weak_imgs_per_s']:>10.1f} "
              f"{row['weak_efficiency']:>6.2%} "
              f"{row['strong_ms_per_iter']:>12.1f} "
              f"{row['strong_imgs_per_s']:>12.1f}")

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "results", "ici_scaling.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {out}")


if __name__ == "__main__":
    # APPEND to any pre-existing XLA_FLAGS (setdefault would silently
    # drop the 8-device request and the tool would then 'measure' a
    # collective-free 1-device mesh)
    _flags = [
        f for f in os.environ.get("XLA_FLAGS", "").split()
        if not f.startswith("--xla_force_host_platform_device_count")
    ]
    _flags.append("--xla_force_host_platform_device_count=8")
    os.environ["XLA_FLAGS"] = " ".join(_flags)
    import jax

    # env var alone does not override the axon sitecustomize on this box
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    main()
