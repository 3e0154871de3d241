"""Inference API — load a trained model dir and generate.

Behavior contract: inference/inference.py in the reference:
  - ``Inference(model_dir)`` reads ``model_dir/args.json`` and the
    lexicographically-last ``checkpoint/*.ckpt``, restoring the EMA
    generator (:110-149).
  - ``gen_batch(batch_size, normalize, latent, input_is_latent,
    static_noise, truncation)`` (:54-92): static per-image injection noise
    (same noise replicated over the batch, ``expend_noise`` :48-51) and
    PER-GROUP truncation: each latent group's w slice is lerped toward that
    group's mean-w, estimated from 100K mapped samples (:27-40, 73-87).
  - ``check_valid_group`` raises with the valid names (:94-100).

Note: the reference's group-randomize path contains a latent-slice indexing
typo (``latent[:, a, a]`` for ``latent[:, a:b]``, :67-68); this
implementation does what the surrounding code intends (slice replacement).

TPU-first: the generator apply is jitted once per (batch_size,
input_is_latent) signature; latents/noise live on device; ``gen_batch``
returns numpy for host consumers."""

from __future__ import annotations

import functools
from pathlib import Path
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from gan_control_tpu.models.factory import build_generator, build_group_spec
from gan_control_tpu.utils import checkpoint as ckpt_lib
from gan_control_tpu.utils.config import read_json
from gan_control_tpu.utils.logging_utils import get_logger

_log = get_logger(__name__)


class Inference:
    def __init__(self, model_dir: str | Path):
        _log.info("Init inference class...")
        self.model_dir = Path(model_dir)
        (
            self.model,
            self.params,
            self.spec,
            self.config,
            self.ckpt_iter,
        ) = self.retrieve_model(self.model_dir)
        self.noise = None
        self.reset_noise(jax.random.PRNGKey(0))
        self.mean_w_latent = None  # [512]
        self._jit_cache: dict[Any, Any] = {}

    # -- model loading -------------------------------------------------------

    @staticmethod
    def retrieve_model(model_dir: str | Path):
        model_dir = Path(model_dir)
        config = read_json(model_dir / "args.json")
        spec = build_group_spec(config)
        model = build_generator(config, spec)

        ckpt_path = ckpt_lib.latest_checkpoint(model_dir / "checkpoint")
        if ckpt_path is None:
            raise FileNotFoundError(f"no checkpoint under {model_dir}/checkpoint")
        ckpt_iter = ckpt_path.stem
        _log.info("Loading model: %s, ckpt iter %s", model_dir, ckpt_iter)

        state_dict = ckpt_lib.load_state_dict(ckpt_path)
        z = jnp.zeros((1, config["model_config"].get("latent_size", 512)))
        target = model.init(
            {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}, [z]
        )
        params = ckpt_lib.restore_into(target, state_dict["g_ema"])
        return model, params, spec, config, ckpt_iter

    # -- noise ---------------------------------------------------------------

    def reset_noise(self, rng: jax.Array | None = None):
        """One fixed injection-noise realization (batch 1) per layer."""
        if rng is None:
            rng = jax.random.PRNGKey(np.random.randint(0, 2**31 - 1))
        shapes = self.model.noise_shapes(1)
        keys = jax.random.split(rng, len(shapes))
        self.noise = [
            jax.random.normal(k, s, jnp.float32) for k, s in zip(keys, shapes)
        ]

    @staticmethod
    def expend_noise(noise, batch_size: int):
        """Replicate the per-layer [1,H,W,1] noise across the batch so every
        image shares identical injection noise (reference :48-51)."""
        return [jnp.broadcast_to(n, (batch_size,) + n.shape[1:]) for n in noise]

    # -- latent statistics ----------------------------------------------------

    def calc_mean_w_latents(self, n: int = 100_000, chunk: int = 10_000):
        _log.info("Calc mean_w_latents...")
        style_dim = self.config["model_config"].get("latent_size", 512)
        # params traced, not closed over (remote-compile payload size)
        map_fn = jax.jit(
            lambda p, z: self.model.apply(p, z, method="map_latent")
        )
        acc = np.zeros((style_dim,), np.float64)
        rng = jax.random.PRNGKey(1234)
        for i in range(n // chunk):
            rng, k = jax.random.split(rng)
            w = map_fn(self.params, jax.random.normal(k, (chunk, style_dim)))
            acc += np.asarray(w, np.float64).mean(axis=0)
        self.mean_w_latent = jnp.asarray(acc / (n // chunk), jnp.float32)

    def group_truncate(self, latent_w: jax.Array, truncation: float) -> jax.Array:
        """Per-group truncation toward the per-group mean w (reference
        :73-87). For contiguous groups spanning the full 512-d latent this is
        one lerp toward the mean-w vector."""
        if self.mean_w_latent is None:
            self.calc_mean_w_latents()
        return self.mean_w_latent + truncation * (latent_w - self.mean_w_latent)

    # -- generation ------------------------------------------------------------

    def check_valid_group(self, group: str):
        names = () if self.spec is None else self.spec.names
        if group not in names:
            raise ValueError(
                f"group: {group} not in valid group names for this model\n"
                f"Valid group names are:\n{names}"
            )

    def _apply_fn(self, input_is_latent: bool, use_noise: bool):
        key = (input_is_latent, use_noise)
        if key not in self._jit_cache:

            @functools.partial(jax.jit, static_argnames=())
            def run(params, latent, noise, rng):
                img, latent_w = self.model.apply(
                    params,
                    [latent],
                    return_latents=True,
                    input_is_latent=input_is_latent,
                    noise=noise if use_noise else None,
                    rngs={"noise": rng},
                )
                return img, latent_w

            self._jit_cache[key] = run
        return self._jit_cache[key]

    def gen_batch(
        self,
        batch_size: int = 1,
        normalize: bool = True,
        latent: jax.Array | None = None,
        input_is_latent: bool = False,
        static_noise: bool = True,
        truncation: float = 1.0,
        rng: jax.Array | None = None,
        **group_overrides,
    ):
        """Returns (images, latent_z_or_w_in, latent_w_plus).

        ``group_overrides``: with ``input_is_latent=True``, pass
        ``<group>='random'`` to re-randomize that group's w slice from a
        fresh mapped z (reference :62-68 — implementing the intended slice
        semantics, not its `[:, a, a]` indexing typo)."""
        if rng is None:
            rng = jax.random.PRNGKey(np.random.randint(0, 2**31 - 1))
        style_dim = self.config["model_config"].get("latent_size", 512)
        # CONTRACT: make_attributes_df.py pre-samples the batch-sharded z
        # with this exact 3-way split (it needs k_z before calling in) so
        # sharded and unsharded sweeps produce identical rows — keep the
        # split order/arity in sync (pinned by the sharded-sweep parity test)
        rng, k_z, k_noise = jax.random.split(rng, 3)
        if latent is None:
            latent = jax.random.normal(k_z, (batch_size, style_dim))
        latent = jnp.asarray(latent)
        if input_is_latent and group_overrides:
            from gan_control_tpu.latent.groups import insert_group_latent

            for group_key, val in group_overrides.items():
                self.check_valid_group(group_key)
                if isinstance(val, str) and val == "random":
                    rng, k_g = jax.random.split(rng)
                    fresh_w = self.model.apply(
                        self.params,
                        jax.random.normal(k_g, (latent.shape[0], style_dim)),
                        method="map_latent",
                    )
                    g = self.spec.group(group_key)
                    latent = insert_group_latent(
                        self.spec,
                        latent,
                        fresh_w[:, g.latent_start : g.latent_end],
                        group_key,
                    )

        injection_noise = None
        if static_noise:
            # the reference draws a FRESH static realization per call
            # (reset_noise() inside gen_batch, inference.py:69-71) and
            # shares it across the batch; deterministic in this call's rng.
            # NOTE: gen_batch_by_controls intentionally does NOT reset —
            # it reuses self.noise, exactly like the reference.
            self.reset_noise(jax.random.fold_in(k_noise, 1))
            injection_noise = self.expend_noise(self.noise, latent.shape[0])

        if truncation < 1:
            if not input_is_latent:
                latent = self.model.apply(self.params, latent, method="map_latent")
                input_is_latent = True
            latent = self.group_truncate(latent, truncation)

        run = self._apply_fn(input_is_latent, static_noise)
        img, latent_w = run(self.params, latent, injection_noise, k_noise)
        if normalize:
            img = jnp.clip(img * 0.5 + 0.5, 0.0, 1.0)
        return img, latent, latent_w
