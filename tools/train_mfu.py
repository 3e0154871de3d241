"""MFU / roofline accounting for ALL THREE executable families on the
real chip: phase-1 training, generation (serving), and the phase-2b
controller step.

Usage:  python tools/train_mfu.py [--measure] [--exe train|gen|phase2b|all]

For each executable this prints XLA's own cost analysis — FLOPs and HBM
bytes accessed — plus, with ``--measure``, the same-process back-to-back
mean wall-clock (8 donated runs enqueued unsynced, one scalar-fetch sync
at the end so the tunnel RTT amortizes) and the implied MFU against the
v5e peak (197 TFLOP/s bf16 / 98.5 f32). This separates "the executable is
slow because the graph does too many FLOPs" from "slow because the chip
is idle" so optimization work targets the real limiter. Developer tool;
not part of the driver contract (bench.py is).

Executables beyond the four train steps:

- ``gen``: the serving/generation forward exactly as bench.py's headline
  measures it (batch 128, 512², bf16, fresh threefry noise).
- ``phase2b``: the ControllerTrainer attribute_rec step at the reference
  scale (batch 128 on one chip, reference README.md:86 + controller
  config): FcStack forward -> slice insert -> frozen FFHQ-512 G synthesis
  -> frozen Hopenet re-prediction -> MSE, with latent_rec, backward over
  the CONTROLLER params only (the heavy frozen-G/predictor traffic is
  activations, not grads — reference controller_trainer.py:202-239).
"""

from __future__ import annotations

import os
import sys
import time

os.environ.setdefault("GANCTL_LOG_STDERR", "1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

V5E_PEAK_BF16 = 197e12
V5E_HBM_GBS = 819e9  # v5e HBM bandwidth, bytes/s


def build_gen_exe(on_tpu: bool):
    """The bench.py generation headline graph — the SAME builder
    (bench.build_gen_harness), so this accounting cannot diverge from the
    graph the headline measures."""
    import jax

    from bench import build_gen_harness

    h = build_gen_harness(on_tpu)
    params, z = h["params"], h["z"]
    key = jax.random.PRNGKey(7)
    lowered = jax.jit(h["generate"]).lower(params, z, key)

    def run(compiled, _state):
        return None, {"sum": compiled(params, z, key)}

    return {"generation": (lowered, run, None, h["batch"])}


def build_phase2b_exe(on_tpu: bool):
    """Two controller-step executables (ControllerTrainer._make_step
    semantics, trainers/controller_trainer.py):

    - ``phase2b_latent_rec_step``: batch 128, latent_rec only — the
      configuration the reference actually SHIPPED (its controller
      configs disable attribute_rec by name-mangling:
      ``"losses": [..., "attribute_rec_"]``,
      orientation_w_latent_controller.json) — no G in the graph.
    - ``phase2b_attr_rec_step``: the full attribute_rec step (frozen
      remat'ed FFHQ-512 G + frozen Hopenet in the backward) at
      BENCH_CTRL_BATCH (default 32: batch 128 needs 27 GB even
      remat'ed — this leg is a HEAVIER-than-reference capability)."""
    import jax
    import jax.numpy as jnp
    import optax

    from __graft_entry__ import FFHQ_GROUPS
    from gan_control_tpu.latent.groups import GroupSpec
    from gan_control_tpu.losses.predictors import hopenet as hp
    from gan_control_tpu.models.controller import FcStack
    from gan_control_tpu.models.generator import Generator
    from gan_control_tpu.training.state import reg_adam

    batch = int(os.environ.get("BENCH_CTRL_BATCH", 32 if on_tpu else 4))
    size = 512 if on_tpu else 64
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    spec = GroupSpec.from_config(FFHQ_GROUPS, mini_batch=16)
    # remat'ed synthesis, like ControllerTrainer's training step: the
    # attribute_rec backward through the frozen 512² G OOMs the 16GB v5e
    # un-remat'ed (measured, even at batch 64)
    gen = Generator(size=size, style_dim=512, n_mlp=8, split_fc=True,
                    fc_groups=spec.fc_dims(), dtype=dtype,
                    remat=on_tpu)
    z = jax.random.normal(jax.random.PRNGKey(0), (1, 512))
    g_params = gen.init({"params": jax.random.PRNGKey(1),
                         "noise": jax.random.PRNGKey(2)}, [z])

    group = spec.group("orientation")
    s, e = group.latent_start, group.latent_end
    ctrl = FcStack(n_mlp=4, mid_dim=512, out_dim=group.latent_size,
                   lr_mlp=0.01)
    c_params = ctrl.init(jax.random.PRNGKey(3), jnp.zeros((1, 3)))
    pose = hp.make_model({})
    pose_params = hp.init_params(pose, jax.random.PRNGKey(4))
    tx = reg_adam(0.002, 4)
    opt_state = tx.init(c_params)

    controls = jax.random.normal(jax.random.PRNGKey(5), (batch, 3)) * 20.0
    w = jax.random.normal(jax.random.PRNGKey(6), (batch, 512))
    key = jax.random.PRNGKey(8)

    def step(c_params, opt_state, controls, w, rng, g_params, pose_params):
        def loss_fn(p):
            pred_latent = ctrl.apply(p, controls)
            rec = jnp.mean(jnp.abs(pred_latent - w[:, s:e]))
            latent = w.at[:, s:e].set(pred_latent)
            img, _ = gen.apply(g_params, [latent], input_is_latent=True,
                               rngs={"noise": rng})
            pred = hp.predict(pose, pose_params, img)
            attr = jnp.mean(jnp.square(pred - controls))
            return rec + 0.1 * attr, (rec, attr)

        (loss, _aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(c_params)
        updates, opt_state = tx.update(grads, opt_state, c_params)
        c_params = optax.apply_updates(c_params, updates)
        return (c_params, opt_state), {"loss": loss}

    lowered = jax.jit(step, donate_argnums=(0, 1)).lower(
        c_params, opt_state, controls, w, key, g_params, pose_params
    )
    carry = {"c": c_params, "o": opt_state}

    def run(compiled, _state):
        (carry["c"], carry["o"]), m = compiled(
            carry["c"], carry["o"], controls, w, key, g_params, pose_params
        )
        return None, m

    # the reference-shipped configuration: latent_rec only, batch 128
    ref_batch = 128 if on_tpu else 8
    controls_ref = jax.random.normal(jax.random.PRNGKey(9),
                                     (ref_batch, 3)) * 20.0
    w_ref = jax.random.normal(jax.random.PRNGKey(10), (ref_batch, 512))
    c2 = ctrl.init(jax.random.PRNGKey(11), jnp.zeros((1, 3)))
    o2 = tx.init(c2)

    def step_rec(c_params, opt_state, controls, w):
        def loss_fn(p):
            pred_latent = ctrl.apply(p, controls)
            return jnp.mean(jnp.abs(pred_latent - w[:, s:e])), ()

        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(c_params)
        updates, opt_state = tx.update(grads, opt_state, c_params)
        return (optax.apply_updates(c_params, updates), opt_state), {
            "loss": loss
        }

    lowered_rec = jax.jit(step_rec, donate_argnums=(0, 1)).lower(
        c2, o2, controls_ref, w_ref
    )
    carry2 = {"c": c2, "o": o2}

    def run_rec(compiled, _state):
        (carry2["c"], carry2["o"]), m = compiled(
            carry2["c"], carry2["o"], controls_ref, w_ref
        )
        return None, m

    return {"phase2b_latent_rec_step": (lowered_rec, run_rec, None, ref_batch),
            "phase2b_attr_rec_step": (lowered, run, None, batch)}


def build_train_exes(on_tpu: bool):
    import jax

    from bench import build_train_harness

    h = build_train_harness(on_tpu=on_tpu)
    steps, state, pred_params = h["steps"], h["state"], h["pred_params"]
    real, zs, cfg, batch = h["real"], h["zs"], h["cfg"], h["batch"]
    path_batch = max(1, batch // cfg.path_batch_shrink)

    # donate the state (like the real trainer's jits): without donation each
    # in-flight timed execution allocates a FULL new output state, and the
    # back-to-back rep loop OOMs the 16GB chip on accumulated state copies
    donate = {"donate_argnums": (0,)}
    carry = {"state": state}
    exes = {}
    specs = {
        "d_step": (lambda st: jax.jit(steps["d_step"], **donate).lower(
            st, real, (zs[0],)), lambda f, st: f(st, real, (zs[0],))),
        "g_step": (lambda st: jax.jit(steps["g_step"], **donate).lower(
            st, (zs[1],), pred_params), lambda f, st: f(st, (zs[1],), pred_params)),
        "d_reg_step": (lambda st: jax.jit(steps["d_reg_step"], **donate).lower(
            st, real), lambda f, st: f(st, real)),
        "g_reg_step": (lambda f_st: jax.jit(steps["g_reg_step"], **donate).lower(
            f_st, (zs[2][:path_batch],)),
            lambda f, st: f(st, (zs[2][:path_batch],))),
    }
    cadence = {"d_step": 1.0, "g_step": 1.0,
               "d_reg_step": 1.0 / cfg.d_reg_every,
               "g_reg_step": 1.0 / cfg.g_reg_every}
    # per-executable batch: g_reg_step processes the SHRUNK path batch
    per_batch = {"d_step": batch, "g_step": batch, "d_reg_step": batch,
                 "g_reg_step": path_batch}
    for name, (lower, call) in specs.items():
        def run(compiled, _unused, _call=call):
            carry["state"], m = _call(compiled, carry["state"])
            return None, m

        exes[name] = (lower(state), run, cadence[name], per_batch[name])
    return exes


def report(exes: dict, measure: bool, label: str):
    total_amortized = 0.0
    have_cadence = all(c is not None for _, _, c, _ in exes.values())
    # the family's cadence-amortized imgs/s is over the FULL train batch
    # (the reg steps amortize into it; g_reg's shrunk path batch only
    # affects its own per-exe line)
    family_batch = max(b for _, _, _, b in exes.values())
    for name, (low, run, cad, batch) in exes.items():
        compiled = low.compile()
        cost = compiled.cost_analysis()
        cost = cost[0] if isinstance(cost, (list, tuple)) else cost
        flops = float(cost.get("flops", 0.0))
        bytes_acc = float(cost.get("bytes accessed", 0.0))
        line = (f"{name:22s} flops={flops/1e12:7.3f} TF  "
                f"hbm={bytes_acc/1e9:7.2f} GB  "
                f"compute-floor={flops/V5E_PEAK_BF16*1e3:6.1f} ms  "
                f"hbm-floor={bytes_acc/V5E_HBM_GBS*1e3:6.1f} ms")
        if measure:
            def force(metrics):
                # block_until_ready is a NO-OP over the axon tunnel: only a
                # scalar FETCH proves the program ran (verify SKILL.md); one
                # fetch drains the whole enqueued stream
                return float(np.asarray(next(iter(metrics.values()))))

            _, m = run(compiled, None)
            force(m)  # warmup (load + first run)
            reps = 8
            t0 = time.perf_counter()
            for _ in range(reps):
                _, m = run(compiled, None)
            force(m)
            # back-to-back mean: the ~0.1 s tunnel RTT of the final sync
            # amortizes over reps instead of inflating every sample
            dt = (time.perf_counter() - t0) / reps
            mfu = flops / V5E_PEAK_BF16 / dt
            hbm_util = bytes_acc / V5E_HBM_GBS / dt
            limiter = ("HBM" if bytes_acc / V5E_HBM_GBS
                       > flops / V5E_PEAK_BF16 else "compute")
            line += (f"  measured={dt*1e3:7.1f} ms  MFU={mfu:5.1%}  "
                     f"HBM={hbm_util:5.1%}  limiter={limiter} "
                     f"({batch/dt:.1f} imgs/s)")
            if cad is not None:
                total_amortized += dt * cad
            del m
        print(line)
    if measure and have_cadence and total_amortized:
        print(f"[{label}] cadence-amortized (sync-bounded upper bound): "
              f"{total_amortized*1e3:.1f} ms/iter "
              f"({family_batch/total_amortized:.1f} imgs/s)")


def main():
    import jax

    from bench import _setup_jax

    measure = "--measure" in sys.argv
    which = "train"
    if "--exe" in sys.argv:
        which = sys.argv[sys.argv.index("--exe") + 1]
    on_tpu = jax.default_backend() != "cpu"
    # persistent compile cache: big executables, minutes each cold over
    # the tunnel — warm runs load from /tmp/jax_tpu_cache instead
    _setup_jax(on_tpu)
    if which in ("train", "all"):
        report(build_train_exes(on_tpu), measure, "train")
    if which in ("gen", "all"):
        report(build_gen_exe(on_tpu), measure, "gen")
    if which in ("phase2b", "all"):
        report(build_phase2b_exe(on_tpu), measure, "phase2b")


if __name__ == "__main__":
    main()
