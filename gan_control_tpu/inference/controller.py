"""Controlled-inference API — the user-facing entry point of the framework.

Behavior contract: inference/controller.py in the reference:
  - ``Controller(controller_dir)`` extends Inference over
    ``controller_dir/generator`` (the self-contained layout produced by
    phase-2 training) and discovers one FcStack controller per latent group
    by directory-name prefix (:16-27, 82-116), plus the alternative 8-class
    'expression_q' head (:25-27).
  - ``gen_batch_by_controls(batch_size, latent, normalize, input_is_latent,
    static_noise, **{group: value})`` (:29-54): map z -> w, replace each
    controlled group's slice of w with ``fc_controls[group](value)``, run
    synthesis with static injection noise. An 8-column expression tensor
    routes to 'expression_q' (:43-44).
  - ``insert_group_w_latent`` handles both w [B,512] and w+ [B,L,512]
    (:60-71). (The reference's ``is not 'expression_q'`` string-identity
    bug at :105 is deliberately not reproduced.)"""

from __future__ import annotations

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from gan_control_tpu.latent.groups import insert_group_latent
from gan_control_tpu.inference.inference import Inference
from gan_control_tpu.models.controller import FcStack
from gan_control_tpu.utils import checkpoint as ckpt_lib
from gan_control_tpu.utils.config import read_json
from gan_control_tpu.utils.logging_utils import get_logger

_log = get_logger(__name__)


class Controller(Inference):
    def __init__(self, controller_dir: str | Path):
        _log.info("Init Controller class...")
        controller_dir = Path(controller_dir)
        super().__init__(controller_dir / "generator")
        self.fc_controls = {}
        self.fc_params = {}
        self.config_controls = {}
        if self.spec is None:
            # merged/vanilla generator: no latent partition — a single
            # merged controller predicts the FULL w (ControllerTrainer's
            # spec=None path); discover it under every head-like subdir
            names = [
                d.name.split("_")[0] for d in controller_dir.iterdir()
                if d.is_dir() and d.name != "generator"
            ]
            names = sorted(set(names))
        else:
            names = list(self.spec.names) + ["expression_q"]
        for group in names:
            found = self.retrieve_controller(controller_dir, group)
            if found is None:
                continue
            model, params, cfg = found
            self.fc_controls[group] = model
            self.fc_params[group] = params
            self.config_controls[group] = cfg

    def retrieve_controller(self, controller_dir: Path, group: str):
        """Find ``<group>*/`` controller subdir (name-prefix discovery like
        the reference :82-89); returns (module, params, config) or None."""
        candidates = sorted(
            d
            for d in controller_dir.iterdir()
            if d.is_dir() and d.name.startswith(group) and d.name != "generator"
        )
        # exact-prefix collision: 'expression' must not swallow 'expression_q'
        if group == "expression":
            candidates = [c for c in candidates
                          if not c.name.startswith("expression_q")]
        if not candidates:
            return None
        cdir = candidates[-1]
        cfg = read_json(cdir / "args.json") if (cdir / "args.json").exists() else {}
        ckpt_path = ckpt_lib.latest_checkpoint(cdir / "checkpoint")
        if ckpt_path is None:
            return None
        state_dict = ckpt_lib.load_state_dict(ckpt_path)
        mcfg = cfg.get("model_config", {})
        group_key = "expression" if group == "expression_q" else group
        out_dim = (self.spec.group(group_key).latent_size if self.spec is not None
                   else self.config["model_config"].get("latent_size", 512))
        model = FcStack(
            n_mlp=mcfg.get("n_mlp", 4),
            mid_dim=mcfg.get("mid_dim", 512),
            out_dim=out_dim,
            lr_mlp=mcfg.get("lr_mlp", 0.01),
        )
        in_dim = mcfg.get("in_dim", 3)
        target = model.init(jax.random.PRNGKey(0), jnp.zeros((1, in_dim)))
        params = ckpt_lib.restore_into(target, state_dict["controller"])
        _log.info("loaded controller for group %s from %s", group, cdir.name)
        return model, params, cfg

    def generate_group_w_latent(self, group: str, value: jax.Array) -> jax.Array:
        return self.fc_controls[group].apply(
            self.fc_params[group], jnp.asarray(value, jnp.float32)
        )

    def gen_batch_by_controls(
        self,
        batch_size: int = 1,
        latent: jax.Array | None = None,
        normalize: bool = True,
        input_is_latent: bool = False,
        static_noise: bool = True,
        rng: jax.Array | None = None,
        **controls,
    ):
        """Returns (images, latent_in, latent_w)."""
        if rng is None:
            rng = jax.random.PRNGKey(np.random.randint(0, 2**31 - 1))
        rng, k_z, k_noise = jax.random.split(rng, 3)
        style_dim = self.config["model_config"].get("latent_size", 512)
        if latent is None:
            latent = jax.random.normal(k_z, (batch_size, style_dim))
        latent = jnp.asarray(latent)

        if input_is_latent:
            latent_w = latent
        else:
            latent_w = self.model.apply(self.params, latent, method="map_latent")

        for group, value in controls.items():
            value = jnp.asarray(value, jnp.float32)
            if group == "expression" and value.shape[-1] == 8 and "expression_q" in self.fc_controls:
                group_w = self.generate_group_w_latent("expression_q", value)
            else:
                if group not in self.fc_controls:
                    raise ValueError(
                        f"no controller for group '{group}'; have "
                        f"{sorted(self.fc_controls)}"
                    )
                group_w = self.generate_group_w_latent(group, value)
            if self.spec is None:
                # merged controller on a vanilla generator: the head
                # predicts the FULL w
                latent_w = jnp.broadcast_to(group_w, latent_w.shape)
            else:
                latent_w = insert_group_latent(
                    self.spec, latent_w, group_w,
                    "expression" if group == "expression_q" else group,
                )

        injection_noise = None
        if static_noise:
            injection_noise = self.expend_noise(self.noise, latent.shape[0])
        run = self._apply_fn(True, static_noise)
        img, _ = run(self.params, latent_w, injection_noise, k_noise)
        if normalize:
            img = jnp.clip(img * 0.5 + 0.5, 0.0, 1.0)
        # third value is the ASSEMBLED latent (w [B,512], or the w+ that was
        # passed in) — the reference returns its pre-synthesis latent_w
        # (controller.py:51-54), NOT the generator's broadcast w+
        return img, latent, latent_w
