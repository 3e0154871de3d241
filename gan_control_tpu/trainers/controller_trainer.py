"""Phase-2b trainer: per-attribute control encoders.

Behavior contract: ControllerTrainer (reference trainers/controller_trainer.py
— semantics; its published imports are stale, SURVEY.md §0):
  - loads the frozen phase-1 generator from ``generator_dir`` and copies its
    args.json + latest checkpoint into ``<save_dir>/generator`` so the
    controller dir is self-contained (:80-87) — the layout Controller
    inference expects,
  - derives the working group + its latent size from the configured loss's
    ``same_group_name`` (:94-101),
  - FcStack(lr_mlp, n_mlp, in_dim, mid_dim, group_latent_size) + Adam with
    reg-ratio scaling (:104-113),
  - data: (controls, w) rows from the phase-2a attributes DataFrame with the
    loss->column mapping (:143-152),
  - loss: ``latent_rec`` L1/MSE between predicted group latent and the true
    group slice of w (:222-229); optional ``attribute_rec``: swap the
    predicted slice into w, run the frozen G, re-predict the attribute with
    the frozen predictor, compare to the target control
    (weight ``attribute_rec_w``, :231-239),
  - eval on the held-out 10% split (:292-335), checkpoints
    {controller, controller_optim} (:397-406).

TPU-first: the whole update (FcStack fwd + optional frozen-G synthesis +
predictor + backward) is one jitted SPMD step over a 1-D 'data' mesh — the
batch dimension (controls, w rows) is sharded over ICI and every parameter
tree (controller, frozen G, frozen predictor) is replicated, so the
``attribute_rec`` frozen-G 512² synthesis at batch 128 — by far the heavy
term (reference controller_trainer.py:202-239, trained on a single V100) —
scales across chips exactly like the phase-1 steps; XLA inserts the
controller-gradient all-reduce."""

from __future__ import annotations

import shutil
from pathlib import Path
from typing import Any, Callable, Mapping

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gan_control_tpu.data.dataframe import attribute_column_for, get_dataframe_data_loader
from gan_control_tpu.inference.inference import Inference
from gan_control_tpu.models.controller import FcStack
from gan_control_tpu.training.state import reg_adam
from gan_control_tpu.utils import checkpoint as ckpt_lib
from gan_control_tpu.utils.config import make_save_dir, read_json
from gan_control_tpu.utils.logging_utils import get_logger

_log = get_logger(__name__)

# loss name -> the latent group it controls (same_group_name in the phase-1
# config loss blocks; configs/ffhq.json)
LOSS_TO_GROUP = {
    "orientation_loss": "orientation",
    "age_loss": "age",
    "expression_loss": "expression",
    "hair_loss": "hair",
    "gamma_loss": "gamma",
    "recon_gamma_loss": "gamma",
    "embedding_loss": "id",
    "dog_id_loss": "id",
    "style_loss": "style",
}


@flax.struct.dataclass
class ControllerState:
    step: jax.Array
    params: Any
    opt_state: Any


class ControllerTrainer:
    def __init__(
        self,
        config_path: str | Path | None = None,
        config: Mapping[str, Any] | None = None,
        init_dirs: bool = True,
        predict_fn: Callable[[jax.Array], jax.Array] | None = None,
        controller_criterion: Callable[[jax.Array, jax.Array], jax.Array] | None = None,
        data_loader=None,
        eval_data=None,
        mesh: Mesh | None = None,
    ):
        assert (config_path is None) != (config is None)
        self.config = dict(config) if config is not None else read_json(config_path)
        mc = self.config["model_config"]
        tc = self.config["training_config"]
        self.mc, self.tc = mc, tc

        # frozen phase-1 generator
        self.inference = Inference(tc["generator_dir"])
        self.generator = self.inference.model
        # attribute_rec backprops THROUGH the frozen G back to the
        # controller output: at 512²/batch 128 the un-remat'ed synthesis
        # activations blow the 16GB v5e (measured: OOM even at batch 64) —
        # the training step runs on a remat'ed clone (per-conv
        # rematerialization, the same plan the phase-1 reg steps use);
        # eval/sample forwards have no backward and keep the plain module
        self.generator_step = (
            self.generator.clone(remat=True)
            if tc.get("remat", True) and hasattr(self.generator, "remat")
            else self.generator
        )
        self.g_params = self.inference.params
        self.spec = self.inference.spec

        # working group + latent slice
        loss_name = mc["loss"]
        if loss_name in LOSS_TO_GROUP:
            self.working_group = LOSS_TO_GROUP[loss_name]
        elif loss_name.endswith("_loss"):
            # custom loss blocks beyond the reference battery (e.g. the
            # blob-world toy predictors in tools/control_fidelity.py)
            # control the group of the same name
            self.working_group = loss_name[: -len("_loss")]
        else:
            raise KeyError(
                f"model_config.loss {loss_name!r}: not a known loss "
                f"({sorted(LOSS_TO_GROUP)}) and not '<group>_loss'-shaped"
            )
        if self.spec is None:
            # vanilla (merged-attribute) generator: no latent partition, so
            # the controller predicts the FULL w from the control (reference
            # merged_attr_w_latent_controller.json trains on a vanilla
            # generator_dir; its attributes are entangled across all of w)
            latent_size = mc.get("latent_size", 512)
            self.group_slice = (0, latent_size)
            self.group_latent_size = latent_size
        else:
            group = self.spec.group(self.working_group)
            self.group_slice = (group.latent_start, group.latent_end)
            self.group_latent_size = group.latent_size

        # save dir: self-contained layout with a copy of the generator.
        # The dir prefix is the controller HEAD, not the group: an 8-d
        # expression controller must be discoverable under the
        # 'expression_q' slot (reference layout: expression_q* dirs,
        # inference/controller.py:25-27,87) and must not shadow the 64-d
        # 'expression' head.
        self.head_name = self.working_group
        if self.working_group == "expression" and mc.get("in_dim") == 8:
            self.head_name = "expression_q"
        self.save_dir = None
        if init_dirs:
            name = f"{self.head_name}_{self.config.get('save_name', 'controller')}"
            self.save_dir = make_save_dir(
                self.config.get("results_dir", "results/controllers"),
                name,
                self.config,
                debug=tc.get("debug", False),
            )
            self._copy_generator_into_save_dir()

        # controller + optimizer
        self.controller = FcStack(
            n_mlp=mc.get("n_mlp", 4),
            mid_dim=mc.get("mid_dim", 512),
            out_dim=self.group_latent_size,
            lr_mlp=mc.get("lr_mlp", 0.01),
        )
        self.tx = reg_adam(tc.get("lr", 0.002), tc.get("reg_every", 4))
        params = self.controller.init(
            jax.random.PRNGKey(tc.get("seed", 0)), jnp.zeros((1, mc["in_dim"]))
        )
        self.state = ControllerState(
            step=jnp.zeros((), jnp.int32), params=params, opt_state=self.tx.init(params)
        )

        # data
        if data_loader is None:
            attribute = attribute_column_for(loss_name, mc.get("in_dim"))
            self.loader, self.dataset = get_dataframe_data_loader(
                tc["sampled_df_path"], attribute, tc.get("batch", 128)
            )
            self.eval_loader, self.eval_dataset = get_dataframe_data_loader(
                tc["sampled_df_path"], attribute, 50, train=False
            )
        else:
            self.loader, self.dataset = data_loader
            self.eval_loader, self.eval_dataset = eval_data if eval_data else (None, None)

        # losses (reference gates each term on the config 'losses' list,
        # controller_trainer.py:222-239)
        losses = tc.get("losses", ["latent_rec"])
        self.use_latent_rec = "latent_rec" in losses
        self.use_attribute_rec = "attribute_rec" in losses
        if not (self.use_latent_rec or self.use_attribute_rec):
            raise ValueError(f"training_config.losses enables nothing: {losses}")
        self.attribute_rec_w = tc.get("attribute_rec_w", 0.0)
        self.rec_kind = tc.get("rec_loss", "l1")
        self._attr_pred_params = {}
        if predict_fn is not None:
            # injected predictor (tests / custom): takes images only
            self.predict_fn = lambda pp, img, _f=predict_fn: _f(img)
            self.criterion = controller_criterion
            if self.use_attribute_rec and controller_criterion is None:
                raise ValueError("injected predict_fn needs controller_criterion")
        elif self.use_attribute_rec:
            # build the predictor from the registry (the reference's
            # init_loss builds LossModelClass from the generator run's loss
            # config, controller_trainer.py:154-163)
            (self.predict_fn, self.criterion,
             self._attr_pred_params) = self._build_attribute_predictor(
                loss_name, mc.get("in_dim")
            )
        else:
            self.predict_fn = None
            self.criterion = None

        # mesh: 1-D data-parallel over every visible device (same shape as
        # GeneratorTrainer's); parameters replicated, batches sharded
        self.mesh = mesh or Mesh(np.array(jax.devices()), ("data",))
        self.batch_sharding = NamedSharding(self.mesh, P("data"))
        self.replicated = NamedSharding(self.mesh, P())
        self.state = jax.device_put(self.state, self.replicated)
        self.g_params = jax.device_put(self.g_params, self.replicated)
        if self._attr_pred_params:
            self._attr_pred_params = jax.device_put(
                self._attr_pred_params, self.replicated
            )

        self._step_fn = jax.jit(self._make_step(), donate_argnums=(0,))
        self._eval_fn = jax.jit(self._make_eval())
        self.metrics_history: list[dict] = []

    def _put_batch(self, arr, *, train: bool = False) -> jax.Array:
        """Shard a host batch over 'data'. Only EVAL batches (e.g. the
        50-row eval chunks on an 8-chip mesh) may fall back to
        replication when indivisible; a TRAIN batch doing so would
        silently run the full frozen-G synthesis on every chip — zero
        data parallelism — so that is a config error, raised loudly
        (matching GeneratorTrainer's divisibility contract)."""
        arr = np.asarray(arr)
        divisible = arr.shape[0] % self.mesh.devices.size == 0
        if train and not divisible:
            raise ValueError(
                f"training batch {arr.shape[0]} not divisible by the "
                f"{self.mesh.devices.size}-device mesh — every chip would "
                "redundantly recompute the whole batch; pick a divisible "
                "training_config.batch"
            )
        return jax.device_put(
            arr, self.batch_sharding if divisible else self.replicated
        )

    def _build_attribute_predictor(self, loss_name: str, in_dim: int | None):
        """Differentiable predict(params, images) + controller_criterion for
        attribute_rec, built from the predictor registry with the
        generator run's loss block (converted weights when present, random
        with a loud warning otherwise). gamma / 64-d expression route
        through the shared R-Net features (reference's recon-3d
        sub-losses); the 8-class expression_q head has NO differentiable
        predictor — the reference's ESR9Criterion lacks predict/
        controller_criterion too, so its shipped controller trained
        latent_rec-only."""
        import os

        from gan_control_tpu.losses.registry import PREDICTOR_MODULES, _load_predictor

        if loss_name == "expression_loss" and in_dim == 8:
            raise ValueError(
                "attribute_rec is not available for the expression_q head "
                "(no differentiable class predictor; the reference's "
                "ESR9Criterion has no predict either) — use "
                "losses=['latent_rec']"
            )
        feat = None
        base = loss_name
        if loss_name in ("gamma_loss", "recon_gamma_loss"):
            base, feat = "recon_3d_loss", "gamma"
        elif loss_name == "expression_loss" and in_dim == 64:
            base, feat = "recon_3d_loss", "ex"
        mod = _load_predictor(PREDICTOR_MODULES[base])
        gen_tc = self.inference.config.get("training_config", {})
        block = dict(gen_tc.get(base) or {})
        model = mod.make_model(block)
        mp = block.get("model_path", "")
        if mp and os.path.exists(mp) and hasattr(mod, "convert_torch_weights"):
            params = mod.convert_torch_weights(model, mp)
        else:
            _log.warning(
                "%s attribute_rec: RANDOM predictor weights (no checkpoint "
                "at %r) — the attribute loss is mechanically correct but "
                "meaningless until real weights are converted", base, mp,
            )
            params = mod.init_params(model, jax.random.PRNGKey(11))
        if feat is None:
            fn = (lambda pp, img, _mod=mod, _m=model:
                  _mod.predict(_m, pp, img))
        else:
            fn = (lambda pp, img, _mod=mod, _m=model, _f=feat:
                  _mod.extract_feature(_mod.features(_m, pp, img)[-1], _f))
        return fn, mod.controller_criterion, params

    def _copy_generator_into_save_dir(self):
        gdir = Path(self.save_dir) / "generator"
        (gdir / "checkpoint").mkdir(parents=True, exist_ok=True)
        src = Path(self.tc["generator_dir"])
        shutil.copy(src / "args.json", gdir / "args.json")
        latest = ckpt_lib.latest_checkpoint(src / "checkpoint")
        shutil.copy(latest, gdir / "checkpoint" / latest.name)

    # -- jitted programs ------------------------------------------------------

    def _rec_loss(self, pred, target):
        if self.rec_kind == "l1":
            return jnp.mean(jnp.abs(pred - target))
        return jnp.mean(jnp.square(pred - target))

    def _make_step(self):
        s, e = self.group_slice

        def step(state: ControllerState, controls, org_latent, rng, g_params,
                 pred_params):
            def loss_fn(params):
                pred_latent = self.controller.apply(params, controls)
                metrics = {}
                rec = self._rec_loss(pred_latent, org_latent[:, s:e])
                metrics["latent_rec_loss"] = rec
                # latent_rec contributes to the objective only when listed
                # (reference gates it, controller_trainer.py:224-228); the
                # metric stays for observability either way
                total = rec if self.use_latent_rec else jnp.zeros((), rec.dtype)
                if self.use_attribute_rec:
                    latent = org_latent.at[:, s:e].set(pred_latent)
                    img, _ = self.generator_step.apply(
                        g_params, [latent], input_is_latent=True,
                        rngs={"noise": rng},
                    )
                    pred_attr = self.predict_fn(pred_params, img)
                    attr_loss = self.criterion(pred_attr, controls)
                    metrics["attribute_loss"] = attr_loss
                    total = total + self.attribute_rec_w * attr_loss
                metrics["loss"] = total
                return total, metrics

            (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params
            )
            updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            return (
                ControllerState(step=state.step + 1, params=params, opt_state=opt_state),
                metrics,
            )

        return step

    def _make_eval(self):
        s, e = self.group_slice

        def evaluate(params, controls, org_latent, rng, g_params, pred_params):
            """Held-out metrics (reference evaluate, controller_trainer.py
            :292-335): latent_rec always; attribute_rec (frozen-G synthesis
            with the predicted slice swapped in, re-predicted attribute vs
            target) when enabled."""
            pred_latent = self.controller.apply(params, controls)
            out = {"eval_latent_rec": self._rec_loss(pred_latent, org_latent[:, s:e])}
            if self.use_attribute_rec:
                latent = org_latent.at[:, s:e].set(pred_latent)
                img, _ = self.generator.apply(
                    g_params, [latent], input_is_latent=True, rngs={"noise": rng}
                )
                pred_attr = self.predict_fn(pred_params, img)
                out["eval_attribute_loss"] = self.criterion(pred_attr, controls)
            return out

        return evaluate

    def evaluate(self) -> dict:
        """Aggregate eval metrics over several held-out batches (reference
        num_of_batches = 5 debug / 25, :299)."""
        if self.eval_loader is None:
            return {}
        n_batches = 5 if self.tc.get("debug") else 25
        rng = jax.random.PRNGKey(int(self.state.step))
        agg: dict[str, float] = {}
        for b in range(n_batches):
            ec, ew = next(self.eval_loader)
            rng, k = jax.random.split(rng)
            m = self._eval_fn(
                self.state.params, self._put_batch(ec), self._put_batch(ew), k,
                self.g_params, self._attr_pred_params,
            )
            for k2, v in m.items():
                agg[k2] = agg.get(k2, 0.0) + float(v)
        return {k2: v / n_batches for k2, v in agg.items()}

    def save_dual_images(self, i: int):
        """Interleaved real/pred grid: columns alternate the frozen-G image
        from the ORIGINAL w row and from w with the controller-predicted
        group slice swapped in, identical injection noise for the pair
        (reference save_dual_images, controller_trainer.py:364-391)."""
        from gan_control_tpu.evaluation.generation import save_image_grid

        if self.save_dir is None or self.eval_dataset is None:
            return None
        s, e = self.group_slice
        n = 8
        rows = np.random.default_rng(i).integers(0, len(self.eval_dataset), n)
        controls = jnp.asarray(np.stack([self.eval_dataset[r][0] for r in rows]))
        latent_ws = jnp.asarray(np.stack([self.eval_dataset[r][1] for r in rows]))

        shapes = self.generator.noise_shapes(n)
        key = jax.random.PRNGKey(i)
        noise = [
            jax.random.normal(jax.random.fold_in(key, li), sh)
            for li, sh in enumerate(shapes)
        ]
        pred_latent = self.controller.apply(self.state.params, controls)
        pred_ws = latent_ws.at[:, s:e].set(pred_latent)
        real_img, _ = self.generator.apply(
            self.g_params, [latent_ws], input_is_latent=True, noise=noise,
            rngs={"noise": key},
        )
        pred_img, _ = self.generator.apply(
            self.g_params, [pred_ws], input_is_latent=True, noise=noise,
            rngs={"noise": key},
        )
        # interleave real/pred pairs
        pairs = jnp.stack([real_img, pred_img], axis=1).reshape(
            (2 * n,) + real_img.shape[1:]
        )
        pairs = jnp.clip(pairs * 0.5 + 0.5, 0.0, 1.0)
        out = Path(self.save_dir) / "images" / "sample"
        out.mkdir(parents=True, exist_ok=True)
        path = out / f"{i:06d}.png"
        save_image_grid(pairs, path, nrow=4)
        _log.info("saved dual real/pred grid: %s", path)
        return path

    # -- loop -------------------------------------------------------------------

    def train(self, num_iters: int | None = None):
        tc = self.tc
        total = num_iters if num_iters is not None else tc["iter"]
        eval_interval = tc.get("min_evaluate_interval", 5000)
        save_interval = tc.get("save_nets_interval", 20000)
        rng = jax.random.PRNGKey(tc.get("seed", 0) + 7)
        start = int(self.state.step)
        for i in range(start, total):
            controls, w = next(self.loader)
            rng, k = jax.random.split(rng)
            self.state, metrics = self._step_fn(
                self.state,
                self._put_batch(controls, train=True),
                self._put_batch(w, train=True),
                k,
                self.g_params, self._attr_pred_params,
            )
            if i % eval_interval == 0:
                vals = {k2: float(v) for k2, v in metrics.items()}
                vals["iter"] = i
                vals.update(self.evaluate())
                self.metrics_history.append(vals)
                _log.info("controller iter %d: %s", i, vals)
                if self.save_dir:
                    self.save_dual_images(i)
            if self.save_dir and i > start and i % save_interval == 0:
                self.save_nets(i)
        if self.save_dir:
            self.save_nets(total)

    def save_nets(self, step: int):
        payload = {
            "controller": self.state.params,
            "controller_optim": self.state.opt_state,
        }
        return ckpt_lib.save_checkpoint(
            Path(self.save_dir) / "checkpoint", payload, step
        )
