"""Phase-1 trainer: the disentangled-GAN training loop.

Behavior contract: GeneratorTrainer (reference trainers/generator_trainer.py)
— per-iteration ``discriminator_update -> generator_update ->
end_iter_update`` (:329-355) with:
  - D step every ``d_every``, R1 regularization every ``d_reg_every``,
  - G step with contrastive predictor losses, path-length reg every
    ``g_reg_every`` on a ``batch // path_batch_shrink`` sub-batch,
  - EMA accumulate per G step,
  - periodic evaluation (FID / separability), sample saving, checkpoints
    (+best-FID), resumable from ``ckpt_config``.

TPU-first architecture: the four updates are separately-compiled jitted SPMD
programs dispatched host-side by iteration number; the batch is sharded over
a 1-D 'data' mesh (ICI), parameters replicated — XLA inserts the gradient
all-reduces that nn.DataParallel did implicitly. The host loop only moves
numpy batches to device and reads back scalar metrics at logging intervals
(no per-iteration .item() syncs — metrics are fetched asynchronously)."""

from __future__ import annotations

import time
from pathlib import Path
from typing import Any, Iterator, Mapping, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gan_control_tpu.data.datasets import get_data_loader, synthetic_data_loader
from gan_control_tpu.latent.groups import GroupSpec, random_arrangement
from gan_control_tpu.models.factory import (
    build_discriminator,
    build_generator,
    build_group_spec,
)
from gan_control_tpu.training.state import init_gan_state, make_gan_optimizers
from gan_control_tpu.training.train_step import (
    AttributeLossSpec,
    TrainStepConfig,
    make_train_steps,
)
from gan_control_tpu.utils import checkpoint as ckpt_lib
from gan_control_tpu.utils.config import (
    add_weight_to_name,
    config_checks,
    make_save_dir,
    read_json,
)
from gan_control_tpu.utils.logging_utils import get_logger

_log = get_logger(__name__)


def mixing_noise(rng: np.random.Generator, batch: int, latent_dim: int, prob: float):
    """1 or 2 z tensors (style mixing with probability ``prob``; reference
    trainers/utils.py:19-23). Host-side numpy; the count is static per call
    so each arm compiles once."""
    n = 2 if prob > 0 and rng.random() < prob else 1
    return tuple(
        rng.standard_normal((batch, latent_dim)).astype(np.float32) for _ in range(n)
    )


class GeneratorTrainer:
    def __init__(
        self,
        config_path: str | Path | None = None,
        config: Mapping[str, Any] | None = None,
        init_dirs: bool = True,
        attr_losses: Sequence[AttributeLossSpec] = (),
        predictor_params: Mapping[str, Any] | None = None,
        data_loader: Iterator[np.ndarray] | None = None,
        mesh: Mesh | None = None,
    ):
        assert (config_path is None) != (config is None)
        self.config = dict(config) if config is not None else read_json(config_path)
        problems = config_checks(self.config)
        if problems:
            raise ValueError("config problems: " + "; ".join(problems))

        mc = self.config["model_config"]
        tc = self.config["training_config"]
        self.mc, self.tc = mc, tc

        # experiment dir (args.json contract)
        self.save_dir = None
        if init_dirs:
            name = self.config.get("save_name", "experiment")
            if self.config.get("add_weight_to_name"):
                name = add_weight_to_name(name, tc)
            self.save_dir = make_save_dir(
                self.config.get("results_dir", "results"),
                name,
                self.config,
                debug=tc.get("debug", False),
            )
            _log.info("save dir: %s", self.save_dir)

        # latent-group engine
        self.spec: GroupSpec | None = build_group_spec(self.config)
        self.random_mode = tc.get("mini_batch_mode", "normal") == "random"

        # models + optimizers
        self.generator = build_generator(self.config, self.spec)
        self.discriminator = build_discriminator(self.config)
        self.g_tx, self.d_tx = make_gan_optimizers(tc)

        # mesh: 1-D data-parallel over every visible device (ICI)
        self.mesh = mesh or Mesh(np.array(jax.devices()), ("data",))
        self.batch_sharding = NamedSharding(self.mesh, P("data"))
        self.replicated = NamedSharding(self.mesh, P())

        # frozen predictors
        self.attr_losses = tuple(attr_losses)
        self.predictor_params = dict(predictor_params or {})
        if self.predictor_params and tc.get("predictor_dtype", "float32") != "float32":
            # bf16 battery plan: store the frozen params in the battery
            # dtype too — halves their read bytes in the HBM-bound g_step;
            # eval paths feed f32 images and upcast the weights exactly
            # (losses/registry.cast_predictor_params docstring)
            from gan_control_tpu.losses.registry import cast_predictor_params

            self.predictor_params = cast_predictor_params(
                self.predictor_params, tc["predictor_dtype"]
            )

        # compiled steps
        self.step_cfg = TrainStepConfig(
            batch=tc["batch"],
            mini_batch=tc["mini_batch"],
            r1=tc.get("r1", 1.0),
            d_reg_every=tc.get("d_reg_every", 16),
            g_reg_every=tc.get("g_reg_every", 4),
            path_regularize=tc.get("path_regularize", 2.0),
            path_batch_shrink=tc.get("path_batch_shrink", 2),
            g_moving_average=tc.get("g_moving_average", 10000),
            mixing=tc.get("mixing", 0.0),
            vanilla=mc.get("vanilla", False),
            style_dim=mc.get("latent_size", 512),
            ada_enabled=tc.get("augment", {}).get("enabled", False),
            ada_target=tc.get("augment", {}).get("ada_target", 0.6),
            ada_length=tc.get("augment", {}).get("ada_length", 500_000),
            # augment['p'] > 0 = FIXED augmentation strength (never
            # adapted); 0 = ADA adaptation toward ada_target (reference
            # generator_trainer.py:334, 679-685)
            ada_p_fixed=tc.get("augment", {}).get("p", 0.0),
            # predictor-forward remat in g_step: OFF under the bf16-no-remat
            # memory plan (activations fit; recomputing the 6-net battery
            # in the backward costs ~21 ms/step at 512²/batch 16 on v5e —
            # A/B'd with the full cadence resident), ON for the f32/remat
            # plans where memory is the binding constraint
            remat_predictors=mc.get(
                "remat_predictors",
                not (mc.get("mixed_precision", False) and not mc.get("remat", False)),
            ),
            # battery storage dtype: "bfloat16" halves the frozen-battery
            # HBM traffic in the HBM-bound g_step (TRAINING.md roofline);
            # thresholds stay f32 — drift measured in WEIGHTS.md
            predictor_dtype=tc.get("predictor_dtype", "float32"),
        )
        augment_fn = None
        if self.step_cfg.ada_enabled:
            from gan_control_tpu.training.ada import augment as augment_fn
        # The R1/path-length double-backprop graphs are the 512² HBM
        # high-water mark (the d/g steps fit without remat under bf16, the
        # reg steps do not): run JUST the reg steps on remat'ed module
        # clones (identical params/numerics). model_config.remat_reg=false
        # opts out; moot when the whole model already remats.
        remat_reg = mc.get("remat_reg", True) and not mc.get("remat", False)
        steps = make_train_steps(
            self.generator,
            self.discriminator,
            self.step_cfg,
            spec=self.spec,
            attr_losses=self.attr_losses,
            g_tx=self.g_tx,
            d_tx=self.d_tx,
            augment_fn=augment_fn,
            generator_reg=self.generator.clone(remat=True) if remat_reg else None,
            discriminator_reg=(
                self.discriminator.clone(remat=True) if remat_reg else None
            ),
        )
        donate = {"donate_argnums": (0,)}
        self._d_step = jax.jit(steps["d_step"], **donate)
        self._d_reg_step = jax.jit(steps["d_reg_step"], **donate)
        self._g_step = jax.jit(steps["g_step"], **donate)
        self._g_reg_step = jax.jit(steps["g_reg_step"], **donate)

        # mini_batch_mode 'random' (reference RandomMiniBatchUtils): a FRESH
        # random group slot placement every step (reference
        # mini_batch_random_multi_split_utils.py:45-68). The placement is fed
        # into the one compiled g_step as an Arrangement of ARRAYS (pair
        # sources, share mask, pair masks) — zero recompiles across steps.
        self._arrangement_rng = None
        if self.random_mode and self.spec is not None:
            self._arrangement_rng = np.random.default_rng(tc.get("seed", 0) + 17)

        # state (fresh or resumed)
        self.state = init_gan_state(
            self.generator,
            self.discriminator,
            self.g_tx,
            self.d_tx,
            jax.random.PRNGKey(tc.get("seed", 0)),
            style_dim=self.step_cfg.style_dim,
        )
        if self.step_cfg.ada_p_fixed > 0:
            # fixed augmentation strength from step one (reference :334)
            self.state = self.state.replace(
                ada_p=jnp.asarray(self.step_cfg.ada_p_fixed, jnp.float32)
            )
        self.start_iter = tc.get("start_iter", 0)

        # transfer learning: partial-load a pretrained generator
        # (reference generator_trainer.py:154-157)
        tl = tc.get("transfer_learning_model", {})
        if tl.get("enabled"):
            from gan_control_tpu.inference.inference import Inference
            from gan_control_tpu.utils.transfer import partial_load

            src_params = Inference.retrieve_model(tl["model_path"])[1]
            g_params = partial_load(self.state.g_params, src_params)
            self.state = self.state.replace(
                g_params=g_params, g_ema=jax.tree_util.tree_map(jnp.copy, g_params)
            )

        ckpt_cfg = self.config.get("ckpt_config", {})
        if ckpt_cfg.get("enabled"):
            path = Path(ckpt_cfg["ckpt"])
            _log.info("resuming from %s", path)
            self.state = ckpt_lib.restore_checkpoint(path, self.state)
            # non-numeric names (best_fid.ckpt) keep the configured
            # start_iter (reference try/except, :180-185)
            self.start_iter = ckpt_lib.parse_step(
                path, default=tc.get("start_iter", 0)
            )
        self.state = self._replicate(self.state)
        self.predictor_params = self._replicate(self.predictor_params)

        # data (the loader receives the raw config size — 896 included).
        # Multi-host: each process's loader yields its batch//process_count
        # row slice of the global batch (disjoint IO; see
        # data/datasets.infinite_loader) — an INJECTED data_loader must do
        # the same. The host rng is seeded identically on every process:
        # hosts replay the same z/decision streams in lockstep and
        # contribute only their row shard (_put_global_rows), so the global
        # program sequence never diverges across processes.
        size = mc["size"]
        self.loader = data_loader or get_data_loader(
            self.config.get("data_config", {}), tc["batch"], size,
            shard_index=jax.process_index(), num_shards=jax.process_count(),
        )
        self._host_rng = np.random.default_rng(tc.get("seed", 0) + 1)

        # bookkeeping + observability (Tracker: reference evaluation/tracker.py)
        from gan_control_tpu.evaluation.tracker import Tracker

        self.metrics_history: list[dict] = []
        self.iter_times: list[float] = []
        self.tracker = Tracker(
            save_dir=self.save_dir,
            tensorboard=self.config.get("tensorboard_config", {}).get("enabled", False)
            and self.save_dir is not None,
            csv_monitor=self.config.get("monitor_config", {}).get("enabled", False),
        )
        ec = self.config.get("evaluation_config", {})
        self.fid_cfg = ec.get("fid", {"enabled": False})
        self.separability_cfg = ec.get("separability", {"enabled": False})
        self._fid_feature_fn = None
        self._fid_inception_params = None
        self._sample_z_fixed = None

    # ------------------------------------------------------------------

    def _replicate(self, tree):
        """Replicate a host-local tree over the (possibly multi-process)
        mesh. Single-process: plain device_put; multi-process: every host
        holds an identical copy (same init seed / same restored checkpoint)
        and contributes it as its process-local view of the global array."""
        if jax.process_count() > 1:
            return jax.tree_util.tree_map(
                lambda x: jax.make_array_from_process_local_data(
                    self.replicated, np.asarray(x)
                ),
                tree,
            )
        return jax.device_put(tree, self.replicated)

    def _put_batch(self, batch: np.ndarray) -> jax.Array:
        if jax.process_count() > 1:
            # `batch` is this host's row shard (the sharded loader's output)
            from gan_control_tpu.utils.multihost import host_local_to_global

            return host_local_to_global(np.asarray(batch), self.mesh)
        return jax.device_put(batch, self.batch_sharding)

    def _put_global_rows(self, full: np.ndarray) -> jax.Array:
        """Shard a FULL global batch that every host drew identically
        (lockstep host rng): each process contributes its contiguous row
        slice. The redundant draw is microseconds of numpy; what matters is
        that host-side random DECISIONS (mixing_noise's 1-vs-2 style count)
        stay in lockstep so all processes enqueue the same programs."""
        if jax.process_count() > 1:
            from gan_control_tpu.utils.multihost import host_local_to_global

            pc = jax.process_count()
            if full.shape[0] % pc:
                # silently dropping the remainder rows would diverge from
                # single-host semantics with no error
                raise ValueError(
                    f"global rows {full.shape[0]} not divisible by {pc} hosts"
                )
            rows = full.shape[0] // pc
            local = full[jax.process_index() * rows : (jax.process_index() + 1) * rows]
            return host_local_to_global(local, self.mesh)
        return jax.device_put(full, self.batch_sharding)

    def _sample_z(self, batch: int):
        z = mixing_noise(
            self._host_rng, batch, self.step_cfg.style_dim, self.step_cfg.mixing
        )
        return tuple(self._put_global_rows(zi) for zi in z)

    def _sample_z_single(self, batch: int):
        z = self._host_rng.standard_normal(
            (batch, self.step_cfg.style_dim)
        ).astype(np.float32)
        return self._put_global_rows(z)

    def one_iteration(self, i: int):
        """D update (+R1), G update (+path reg), EMA. Returns metric dict of
        device scalars (not synced)."""
        tc = self.tc
        metrics: dict[str, Any] = {}
        real = self._put_batch(next(self.loader))

        if i % tc.get("d_every", 1) == 0:
            self.state, m = self._d_step(self.state, real, self._sample_z(tc["batch"]))
            metrics.update(m)
        if i % tc.get("d_reg_every", 16) == 0:
            self.state, m = self._d_reg_step(self.state, real)
            metrics.update(m)

        if self._arrangement_rng is not None:
            arrangement = random_arrangement(self.spec, self._arrangement_rng)
            # randomized mode has no mixing support (reference
            # mini_batch_random_multi_split_utils.py:77-78) — one z
            z = self._sample_z_single(tc["batch"])
            self.state, m = self._g_step(
                self.state, (z,), self.predictor_params, None, arrangement
            )
        else:
            self.state, m = self._g_step(
                self.state, self._sample_z(tc["batch"]), self.predictor_params
            )
        metrics.update(m)

        if i % tc.get("g_reg_every", 4) == 0:
            path_batch = max(tc["batch"] // max(tc.get("path_batch_shrink", 2), 1),
                             jax.device_count())
            self.state, m = self._g_reg_step(self.state, self._sample_z(path_batch))
            metrics.update(m)
        return metrics

    def dry_run(self):
        """One compile+execute of every step variant on synthetic data
        (the reference dry_run's role of validating the training graph,
        generator_trainer.py:301-327, minus the DataParallel grad quirks
        that SPMD doesn't have)."""
        _log.info("dry run: compiling all step variants...")
        saved_loader = self.loader
        # the reference dry_run never calls optim.step() (:301-327): it
        # must not perturb (possibly resumed) training state — snapshot
        # everything the iteration mutates and restore after. The snapshot
        # must be a DEVICE COPY: the steps donate their state argument, so
        # holding the original references would restore dead buffers
        saved_state = jax.tree_util.tree_map(jnp.copy, self.state)
        saved_rng_state = self._host_rng.bit_generator.state
        # random mini-batch mode: the arrangement stream must not advance
        # either (it feeds the g_step and, multi-host, must stay in lockstep)
        saved_arr_state = (
            self._arrangement_rng.bit_generator.state
            if self._arrangement_rng is not None else None
        )
        self.loader = synthetic_data_loader(
            self.tc["batch"], self.mc["size"],
            shard_index=jax.process_index(), num_shards=jax.process_count(),
        )
        t0 = time.time()
        m = self.one_iteration(0)
        jax.block_until_ready(m)
        _log.info("dry run done in %.1fs: %s", time.time() - t0,
                  {k: float(v) for k, v in m.items()})
        self.loader = saved_loader
        self.state = saved_state
        self._host_rng.bit_generator.state = saved_rng_state
        if saved_arr_state is not None:
            self._arrangement_rng.bit_generator.state = saved_arr_state
        return m

    def train(self, num_iters: int | None = None):
        import signal

        # preemption save: SIGTERM/SIGINT checkpoint before exiting
        # (extends the reference's resume-only story, SURVEY.md §5.3)
        self._preempted = False

        def _on_term(signum, frame):
            self._preempted = True

        old_handlers = {}
        for sig in (signal.SIGTERM, signal.SIGINT):
            try:
                old_handlers[sig] = signal.signal(sig, _on_term)
            except ValueError:  # non-main thread
                pass

        tc = self.tc
        total = num_iters if num_iters is not None else tc["iter"]
        debug = tc.get("debug", False)
        log_every = 10 if debug else 100
        # debug shrinks the intervals (reference generator_trainer.py:724-732)
        # but an explicitly configured interval always wins
        save_nets_interval = tc.get("save_nets_interval", 10000)
        save_images_interval = tc.get("save_images_interval", 2000)
        # the reference NEVER saves nets in debug and saves images every
        # 100 debug iters (end_iter_update :726-729); an explicitly
        # configured save_nets_interval opts back in (the test/debug-resume
        # workflows rely on it)
        nets_in_debug = "save_nets_interval" in tc
        pending: tuple[int, dict] | None = None

        for i in range(self.start_iter, total):
            self.tracker.mark_start_iter()
            t0 = time.time()
            metrics = self.one_iteration(i)
            # async metric readback: fetch last iter's (already-done) values
            if pending is not None and (pending[0] % log_every == 0):
                vals = {k: float(v) for k, v in pending[1].items()}
                vals["iter"] = pending[0]
                self.metrics_history.append(vals)
                self.tracker.write_stats(pending[0], extra=pending[1])
            pending = (i, metrics)
            self.iter_times.append(time.time() - t0)

            if self.save_dir:
                # reference boundary semantics: iteration 0 DOES save the
                # baseline grid (0 % interval == 0, :726), and after a
                # resume i == start_iter saves/evaluates normally
                if i % save_images_interval == 0 or (debug and i % 100 == 0):
                    self.save_images(i)
                if i % save_nets_interval == 0 and (not debug or nets_in_debug):
                    self.save_nets(i)
            self.evaluate(i)
            if self._preempted:
                _log.warning("preemption signal received — checkpointing at iter %d", i)
                if self.save_dir:
                    jax.block_until_ready(self.state)
                    self.save_nets(i + 1, block=True)
                break

        # flush the final iteration's metrics (they were only pending)
        if pending is not None:
            vals = {k: float(v) for k, v in pending[1].items()}
            vals["iter"] = pending[0]
            self.metrics_history.append(vals)
            self.tracker.write_stats(pending[0], extra=pending[1])

        for sig, h in old_handlers.items():
            signal.signal(sig, h)
        jax.block_until_ready(self.state)
        if self.save_dir and not self._preempted:
            self.save_nets(total, block=True)
        from gan_control_tpu.utils.checkpoint import wait_pending_saves
        wait_pending_saves()

    # -- periodic evaluation (reference end_iter_update, :721-748) ----------

    def _eval_due(self, i: int, interval: int) -> bool:
        """Reference gating: end_iter_update (:724-725) runs evaluation only
        when i % min_evaluate_interval == 0 (debug: every 10 too), and the
        tracker applies each per-eval interval with an iter != 0 guard
        (tracker.py:132-158; debug forces every kind every 100). After a
        resume i == start_iter evaluates normally."""
        if i == 0:
            return False
        debug = self.tc.get("debug")
        min_int = self.tc.get("min_evaluate_interval", 100)
        if not (i % min_int == 0 or (debug and i % 10 == 0)):
            return False
        if debug and i % 100 == 0:
            return True
        return i % interval == 0

    def evaluate(self, i: int):
        if (
            self.fid_cfg.get("enabled")
            and self.save_dir is not None
            and self._eval_due(i, self.fid_cfg.get("fid_interval", 10000))
        ):
            fid = self.evaluate_fid()
            if fid is not None:
                is_best = self.tracker.register_fid(i, fid)
                if is_best:
                    self.save_nets(i, name="best_fid")
        if self.separability_cfg.get("enabled") and self._eval_due(
            i, self.separability_cfg.get("separability_interval", 30000)
        ):
            self.evaluate_separability(i)
        ec = self.config.get("evaluation_config", {})
        for kind, loss_name in (("orientation_hist", "orientation_loss"),
                                ("expression_bar", "expression_loss")):
            kc = ec.get(kind, {})
            if (
                kc.get("enabled")
                and self.save_dir is not None
                and self._eval_due(i, kc.get(f"{kind}_interval", 30000))
            ):
                self.evaluate_attribute_hist(i, kind, loss_name, kc)

    def evaluate_attribute_hist(self, i: int, kind: str, loss_name: str, kc: dict):
        """Orientation histogram / expression class bar over generated
        samples (reference tracker.py:156-183 + evaluation/orientation.py,
        expression.py). Works for EVAL-ONLY predictors too: when the loss
        is disabled for training, the predictor is built standalone with
        pretrained-or-random weights (the reference's init_evaluation
        constructs separate evaluation LossModelClasses, :278-299)."""
        from gan_control_tpu.losses.registry import PREDICTOR_MODULES, _load_predictor
        from gan_control_tpu.utils.plotting import plot_bar, plot_hist

        if loss_name not in self.predictor_params:
            # eval-only predictor: no training loss supplies params
            import os as _os

            from gan_control_tpu.utils.weights import load_pretrained

            mod = _load_predictor(PREDICTOR_MODULES[loss_name])
            block = self.tc.get(loss_name) or {}
            model = mod.make_model(block)
            mp = block.get("model_path", "")
            pp = None
            if mp and _os.path.exists(mp) and hasattr(mod, "convert_torch_weights"):
                pp = mod.convert_torch_weights(model, mp)
            if pp is None:
                _log.warning(
                    "%s (eval-only): RANDOM predictor weights — the %s "
                    "statistic is meaningless until weights are converted",
                    loss_name, kind,
                )
                pp = mod.init_params(model, jax.random.PRNGKey(23))
            self.predictor_params[loss_name] = pp

        n = 100 if self.tc.get("debug") else kc.get("num_of_samples", 2000)
        batch = self.tc["batch"]
        g_ema = self.state.g_ema

        # cache the jitted program per loss (same pattern as
        # _matrix_predict_fn): a fresh closure per eval interval would
        # retrace and recompile the fused generator+predictor graph every
        # 30k iters — minutes each over a remote-compile link
        if not hasattr(self, "_attr_hist_fns"):
            self._attr_hist_fns = {}
        gen_and_predict = self._attr_hist_fns.get(loss_name)
        if gen_and_predict is None:
            mod = _load_predictor(PREDICTOR_MODULES[loss_name])

            # params are traced ARGUMENTS (closed-over weight trees get
            # baked into the compile payload — slow/oversized on
            # remote-compile links)
            model = mod.make_model(self.tc.get(loss_name, {}))

            from gan_control_tpu.utils.precision import predictor_precision_ctx

            @jax.jit
            def gen_and_predict(gp, pp, z, rng):
                # fresh injection noise per batch (the reference draws new
                # noise per generated image) — a constant key would compute
                # the statistic over one shared noise realization
                img, _ = self.generator.apply(gp, [z], rngs={"noise": rng})
                # only the predictor runs at the high-precision setting; G
                # keeps the fast MXU default
                with predictor_precision_ctx(self.tc.get("predictor_precision")):
                    return mod.predict(model, pp, img)

            self._attr_hist_fns[loss_name] = gen_and_predict

        preds = []
        rng = jax.random.PRNGKey(1000 + i)
        for s in range(0, n, batch):
            rng, k, k_noise = jax.random.split(rng, 3)
            z = jax.random.normal(k, (batch, self.step_cfg.style_dim))
            preds.append(
                np.asarray(
                    gen_and_predict(
                        g_ema, self.predictor_params[loss_name], z, k_noise
                    )
                )
            )
        preds = np.concatenate(preds, axis=0)[:n]
        gdir = Path(self.save_dir) / "graphs"
        if kind == "orientation_hist":
            plot_hist(
                [preds[:, 0], preds[:, 1], preds[:, 2]],
                title=f"orientation @ iter {i}",
                labels=["yaw", "pitch", "roll"],
                xlabel="degrees",
                save_path=gdir / f"orientation_{i:06d}.jpg",
            )
            self.tracker.evaluation_dict["orientation/yaw_std"] = float(preds[:, 0].std())
        else:
            counts = np.bincount(preds.astype(int), minlength=8)
            from gan_control_tpu.losses.predictors.esr9 import EXPRESSION_CLASSES

            plot_bar(
                counts,
                list(EXPRESSION_CLASSES),
                title=f"expression classes @ iter {i}",
                save_path=gdir / f"expression_{i:06d}.jpg",
            )

    def evaluate_fid(self) -> float | None:
        """50K-sample FID vs the configured real-set inception stats
        (reference evaluate_fid contract; the reference loads pretrained FID
        weights unconditionally, fid_utils/inception.py:23-60)."""
        import os

        stats_path = self.fid_cfg.get("inception_stat_path", "")
        if not stats_path or not os.path.exists(stats_path):
            _log.warning("fid enabled but stats pickle %r missing — skipping", stats_path)
            return None
        from gan_control_tpu.evaluation import fid as fid_lib

        if self._fid_feature_fn is None:
            weights = self.fid_cfg.get("inception_weights", "")
            if weights == "__random__":
                # explicit smoke/test escape only — the resulting number is
                # NOT an FID against pretrained-stats pickles
                from gan_control_tpu.evaluation.inception import init_params

                _log.warning(
                    "fid: inception_weights='__random__' — using a randomly "
                    "initialized InceptionV3 (smoke-test mode, not a real FID)"
                )
                params = init_params(jax.random.PRNGKey(42))
            else:
                from gan_control_tpu.evaluation.inception import convert_torch_weights
                from gan_control_tpu.utils.weights import load_pretrained

                params = load_pretrained(weights, convert_torch_weights)
                if params is None:
                    _log.warning(
                        "fid enabled but fid.inception_weights %r missing — "
                        "skipping FID (a randomly initialized InceptionV3 would "
                        "make the number meaningless; see WEIGHTS.md)",
                        weights,
                    )
                    return None
            # the fused sharded chunk program: z sampled in-graph and
            # batch-sharded over the trainer mesh, synthesis + InceptionV3
            # on the shards, only [chunk, 2048] features gathered — FID
            # sampling scales linearly over chips instead of replicating
            # fid.batch_size: chunk size of the sweep (defaults to the train
            # batch). Measured standalone on v5e @512² bf16: chunk 16 ->
            # 389 imgs/s, chunk 64 -> 500 imgs/s (a 50K sweep in ~100 s);
            # the default stays at the train batch because the eval runs
            # while training workspaces hold HBM
            self._fid_feature_fn = fid_lib.make_sharded_gen_feature_fn(
                self.generator,
                int(self.fid_cfg.get("batch_size", self.tc["batch"])),
                self.step_cfg.style_dim,
                mesh=self.mesh,
            )
            # _replicate, not device_put: the mesh may span processes
            self._fid_inception_params = self._replicate(params)
        fused, inception_params = self._fid_feature_fn, self._fid_inception_params
        g_ema = self.state.g_ema

        def gen_feats(rng):
            feats = fused(g_ema, inception_params, rng)
            if jax.process_count() > 1:
                # the [chunk, 2048] features are batch-sharded across hosts;
                # the host-side covariance needs the full set on every
                # process (and every process must compute the same FID)
                from jax.experimental import multihost_utils

                feats = multihost_utils.process_allgather(feats, tiled=True)
            return feats

        n = self.fid_cfg.get("num_of_samples", 50000)
        if self.tc.get("debug"):
            n = min(n, 500)
        return fid_lib.evaluate_fid(
            gen_feats, None, stats_path, n_samples=n, batch_size=fused.batch
        )

    def evaluate_separability(self, i: int):
        from gan_control_tpu.evaluation.separability import calc_separability
        from gan_control_tpu.losses import contrastive as C

        losses = self.separability_cfg.get("losses", [])
        if self.spec is None:
            _log.warning("separability needs a latent partition (vanilla "
                         "model) — skipping")
            return
        # eval-only separability losses (enabled in evaluation_config but
        # disabled for training) get a STANDALONE predictor, like the
        # reference's init_evaluation LossModelClasses (:278-299): build
        # the spec via the registry from the (disabled) training block,
        # once, with pretrained-or-random weights
        have = {a.name for a in self.attr_losses}
        eval_specs = list(self.attr_losses)
        for missing in [x for x in losses if x not in have]:
            if not hasattr(self, "_eval_only_specs"):
                self._eval_only_specs = {}
            spec_al = self._eval_only_specs.get(missing)
            if spec_al is None:
                block = self.tc.get(missing)
                if not isinstance(block, dict):
                    _log.warning(
                        "separability loss %r has no config block — skipped",
                        missing,
                    )
                    continue
                from gan_control_tpu.losses.registry import build_attr_losses

                specs, params = build_attr_losses(
                    {**{missing: dict(block, enabled=True)},
                     "predictor_precision": self.tc.get("predictor_precision")}
                )
                by_name = {a.name: a for a in specs}
                if missing not in by_name:
                    _log.warning("separability loss %r not buildable — "
                                 "skipped", missing)
                    continue
                spec_al = by_name[missing]
                self.predictor_params[missing] = params[missing]
                self._eval_only_specs[missing] = spec_al
                _log.info("built eval-only predictor for separability "
                          "loss %r", missing)
            eval_specs.append(spec_al)
        n = 100 if self.tc.get("debug") else self.separability_cfg.get("num_of_samples", 2000)
        g_ema = self.state.g_ema

        # cached jitted program (params as traced args): a fresh closure per
        # eval interval would recompile the synthesis graph every time.
        # Injection noise is a FRESH key per batch (the reference draws new
        # noise per image); under 'same_for_same_id' the planes are drawn
        # explicitly and shared even->odd within each evaluated pair
        # (reference separability.py:16-20, 52-57 re_arrange_inject_noise).
        if not hasattr(self, "_separability_gen_fn"):
            share_pairs = self.mc.get("g_noise_mode") == "same_for_same_id"

            @jax.jit
            def _gen(gp, z, rng):
                noise = None
                if share_pairs:
                    noise = [
                        jax.random.normal(jax.random.fold_in(rng, li), sh)
                        for li, sh in enumerate(
                            self.generator.noise_shapes(z.shape[0])
                        )
                    ]
                    noise = [n.at[1::2].set(n[0::2]) for n in noise]
                img, _ = self.generator.apply(
                    gp, [z], noise=noise, rngs={"noise": rng}
                )
                return img

            self._separability_gen_fn = _gen
        _gen = self._separability_gen_fn

        def gen(z, rng):
            return _gen(g_ema, z, rng)

        for al in eval_specs:
            if al.name not in losses:
                continue
            group = self.spec.group(al.group)
            pair_dist = al.pair_dist_fn or C.pairwise_sq_l2
            stats, latents = calc_separability(
                gen,
                lambda imgs, al=al: al.feature_fn(self.predictor_params[al.name], imgs),
                pair_dist,
                jax.random.PRNGKey(i),
                num_of_samples=n,
                same_chunk=(group.latent_start, group.latent_end),
                style_dim=self.step_cfg.style_dim,
                last_layer_only=self.separability_cfg.get(
                    "last_layer_separability_only", True
                ),
                return_latents=True,
            )
            self.tracker.register_separability(i, al.name, stats)
            if self.save_dir is not None:
                # regenerate the closest-impostor pairs (different
                # identities whose 2nd-best distance collapsed — the
                # reference's bucket pairs, tracker.py:303-311). worst_pairs
                # rows are (signature_idx, query_idx): signatures live on
                # even latent rows, queries on odd ones.
                pairs = stats[-1]["worst_pairs"][:4]
                rows = np.stack(
                    [r for sig, qry in pairs for r in (2 * sig, 2 * qry + 1)]
                )
                imgs = _gen(g_ema, latents[rows], jax.random.PRNGKey(i + 1))
                imgs = jnp.clip(imgs * 0.5 + 0.5, 0.0, 1.0)
                self.tracker.save_bucket_images(i, al.name, imgs)

    def save_images(self, i: int):
        """Fixed-z sample grid + one per-group disentanglement matrix
        (reference save_images, :774-850)."""
        from gan_control_tpu.evaluation.generation import save_image_grid

        if self._sample_z_fixed is None:
            self._sample_z_fixed = jax.random.normal(
                jax.random.PRNGKey(7), (16, self.step_cfg.style_dim)
            )
            # one jitted sampler reused for the fixed grid and every matrix
            # (latents differ, the graph doesn't)
            self._sample_fn = jax.jit(
                lambda p, z, r: jnp.clip(
                    self.generator.apply(p, [z], rngs={"noise": r})[0] * 0.5 + 0.5,
                    0.0,
                    1.0,
                )
            )
        imgdir = Path(self.save_dir) / "images"
        sample = self._sample_fn(
            self.state.g_ema, self._sample_z_fixed, jax.random.PRNGKey(0)
        )
        (imgdir / "samples").mkdir(parents=True, exist_ok=True)
        save_image_grid(sample, imgdir / "samples" / f"{i:06d}.jpg", nrow=4)
        if self.spec is not None:
            from gan_control_tpu.evaluation.generation import make_matrix_latents

            for g in self.spec.groups:
                lat = make_matrix_latents(
                    jax.random.PRNGKey(i),
                    ids_in_row=4,
                    pose_in_col=4,
                    style_dim=self.step_cfg.style_dim,
                    same_chunk=(g.latent_start, g.latent_end),
                )
                mat = self._sample_fn(self.state.g_ema, lat, jax.random.PRNGKey(i))
                (imgdir / g.name).mkdir(parents=True, exist_ok=True)
                save_image_grid(mat, imgdir / g.name / f"{i:06d}.jpg", nrow=4)
                self._save_annotated_matrices(i, g.name, mat, imgdir)

    # annotated matrices: which loss drives which images/<kind>/ dir
    _ANNOTATED_KINDS = (
        ("orientation_loss", "orientation_matrix"),
        ("expression_loss", "expression_matrix"),
        ("age_loss", "age_matrix"),
        ("hair_loss", "hair_matrix"),
    )

    def _matrix_predict_fn(self, loss_name: str):
        """Cached jitted predictor forward for matrix annotation (params are
        traced args, not closure constants — remote-compile payload size)."""
        if not hasattr(self, "_matrix_predict_fns"):
            self._matrix_predict_fns = {}
        if loss_name not in self._matrix_predict_fns:
            from gan_control_tpu.losses.registry import (
                PREDICTOR_MODULES,
                _load_predictor,
            )

            from gan_control_tpu.utils.precision import with_predictor_precision

            mod = _load_predictor(PREDICTOR_MODULES[loss_name])
            model = mod.make_model(self.tc.get(loss_name, {}))
            self._matrix_predict_fns[loss_name] = jax.jit(with_predictor_precision(
                lambda p, x, _mod=mod, _m=model: _mod.predict(_m, p, x),
                self.tc.get("predictor_precision"),
            ))
        return self._matrix_predict_fns[loss_name]

    def _save_annotated_matrices(self, i: int, group_name: str, mat01, imgdir):
        """Predictions drawn on the matrix cells (pose axes, age/hair/
        expression text), saved as images/<kind>_matrix/%06d.jpg — the
        reference's annotated matrices (generator_trainer.py:792-850 via
        make_orientation_grid / make_age_grid / make_expression_grid)."""
        from gan_control_tpu.evaluation.attribute_evals import (
            annotate_attribute_images,
        )
        from gan_control_tpu.evaluation.generation import save_image_grid

        enabled = {al.name: al for al in self.attr_losses}
        imgs_pm1 = mat01 * 2.0 - 1.0  # predictors take [-1,1]
        preds_cache: dict[str, np.ndarray] = {}

        def preds_for(loss_name: str) -> np.ndarray:
            if loss_name not in preds_cache:
                preds_cache[loss_name] = np.asarray(
                    self._matrix_predict_fn(loss_name)(
                        self.predictor_params[loss_name], imgs_pm1
                    )
                )
            return preds_cache[loss_name]

        for loss_name, kind in self._ANNOTATED_KINDS:
            al = enabled.get(loss_name)
            if al is None or al.group != group_name:
                continue
            annotated = annotate_attribute_images(
                loss_name, np.asarray(mat01), preds_for(loss_name)
            )
            (imgdir / kind).mkdir(parents=True, exist_ok=True)
            save_image_grid(annotated, imgdir / kind / f"{i:06d}.jpg", nrow=4)

        # combined attribute matrix (axes + expression text) on the id
        # group's matrix (reference make_attribute_matrix, tracker.py:104)
        emb = enabled.get("embedding_loss")
        if (
            emb is not None
            and emb.group == group_name
            and "orientation_loss" in enabled
            and "expression_loss" in enabled
        ):
            annotated = annotate_attribute_images(
                "attribute",
                np.asarray(mat01),
                preds_for("orientation_loss"),
                extra_preds=preds_for("expression_loss"),
            )
            (imgdir / "attribute_matrix").mkdir(parents=True, exist_ok=True)
            save_image_grid(
                annotated, imgdir / "attribute_matrix" / f"{i:06d}.jpg", nrow=4
            )

    def save_nets(self, step: int, name: str | None = None, block: bool = False):
        """Checkpoint the train state. Periodic saves are ASYNC: the
        device->host copy happens here (before the state is donated into
        the next step), the multi-hundred-MB msgpack encode + atomic write
        overlap with training on a background worker. ``block=True`` (the
        final/preemption saves) drains the queue before returning."""
        fut = ckpt_lib.save_checkpoint_async(
            Path(self.save_dir) / "checkpoint", self.state, step, name=name
        )
        if block:
            path = fut.result()
            ckpt_lib.wait_pending_saves()
            _log.info("saved %s", path)
            return path
        fut.add_done_callback(
            lambda f: _log.info("saved %s", f.result()) if not f.exception()
            else _log.error("checkpoint save failed: %r", f.exception())
        )
        return fut
