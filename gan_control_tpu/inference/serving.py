"""Production serving path — one device dispatch per request.

``Controller.gen_batch_by_controls`` is faithful to the reference API
(reference inference/controller.py:29-54) but pays per-request Python
dispatch: an unjitted ``map_latent`` apply, one unjitted FcStack apply per
controlled group, host-side noise broadcasting, and a fresh jit signature
for every distinct batch size. None of that matters in a notebook; all of
it matters behind an endpoint, where every un-batched op dispatch is a
tunnel/PCIe round-trip and every new batch size is a recompile.

``ServingController`` restructures the dispatch TPU-side:

- the WHOLE request — map z->w, per-group FcStack controllers, slice
  insertion, synthesis, [0,1] normalization — is ONE jitted executable;
- executables are cached per (controlled-group set, latent kind, noise
  mode, batch bucket) and can be precompiled with ``warmup()`` before
  traffic arrives;
- request batches are padded to a fixed bucket ladder so arbitrary request
  sizes reuse the compiled ladder (static shapes, no recompiles). Rows are
  independent in G (no cross-batch ops anywhere in synthesis), and the
  random-noise path draws from per-row fold_in keys, so padding cannot
  change the first ``n`` results in either noise mode — asserted by
  tests/test_serving.py.

With ``static_noise=True`` (the default) the returned images/latents match
``gen_batch_by_controls`` numerically (same ops, same noise planes);
parity is tested. With ``static_noise=False`` the draws match only in
distribution — the per-row key discipline above trades exact same-rng
parity for bucket invariance.

Measured on a real v5e over the axon tunnel (tools/serving_bench.py,
512px flagship generator + 4 controlled groups, p50 of 10 requests,
2026-08-17): batch 1 — fused 3123 ms vs multi-dispatch 4954 ms (1.59x);
batch 16 — 5249 vs 5560 ms (1.06x: the batch-16 request is bound by
shipping 16 x 3 MB images back through the tunnel, which both paths pay).
Absolute numbers are tunnel-specific; the same-process A/B ratio is the
datum, and the dispatch win grows with round-trip cost per op.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from gan_control_tpu.inference.controller import Controller
from gan_control_tpu.latent.groups import insert_group_latent
from gan_control_tpu.utils.logging_utils import get_logger

_log = get_logger(__name__)


class ServingController(Controller):
    """Bucketed, fully-jitted controlled generation for serving loops.

    ``buckets``: ascending batch-size ladder; a request of ``n`` images is
    padded to the smallest bucket >= n. Keep the ladder short — each
    (group-set, bucket) pair is one compiled executable.

    ``mesh``: optional 1-D ``jax.sharding.Mesh`` — requests are
    batch-sharded over it and the fused executable spans the chips
    (throughput serving over ICI; rows are independent, so no collectives
    beyond the final gather). Buckets must divide the mesh size.
    """

    def __init__(self, controller_dir, buckets: tuple[int, ...] = (1, 4, 16, 64),
                 mesh=None):
        super().__init__(controller_dir)
        buckets = tuple(sorted({int(b) for b in buckets}))
        if not buckets or buckets[0] < 1:
            raise ValueError(f"invalid bucket ladder: {buckets!r}")
        self.buckets = buckets
        self._serve_cache: dict[Any, Any] = {}
        # optional 1-D device mesh: requests are batch-sharded over it, so
        # one fused executable spans the chips (throughput serving). Params
        # and the fixed noise planes replicate; every bucket must divide
        # evenly so each chip gets identical static shapes.
        self.mesh = mesh
        self._shard = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            bad = [b for b in buckets if b % mesh.size]
            if bad:
                raise ValueError(
                    f"buckets {bad} not divisible by the {mesh.size}-device mesh"
                )
            axis = mesh.axis_names[0]
            self._shard = NamedSharding(mesh, P(axis))
            replicated = NamedSharding(mesh, P())
            self.params = jax.device_put(self.params, replicated)
            self.fc_params = {
                k: jax.device_put(v, replicated) for k, v in self.fc_params.items()
            }
            self.noise = [jax.device_put(n, replicated) for n in self.noise]

    # -- plumbing -------------------------------------------------------------

    def bucket_for(self, n: int) -> int:
        for b in self.buckets:
            if b >= n:
                return b
        raise ValueError(
            f"request batch {n} exceeds the largest bucket {self.buckets[-1]}; "
            f"split the request or extend the ladder"
        )

    def control_dim(self, head: str) -> int:
        return (
            self.config_controls.get(head, {})
            .get("model_config", {})
            .get("in_dim", 3)
        )

    def _route(self, controls: dict) -> dict[str, tuple[str, np.ndarray]]:
        """control-group name -> (controller head, value); 8-column
        'expression' routes to the 'expression_q' head like
        gen_batch_by_controls."""
        routed: dict[str, tuple[str, np.ndarray]] = {}
        for group, value in controls.items():
            value = np.asarray(value, np.float32)
            if value.ndim == 1:
                value = value[:, None]
            if (group == "expression" and value.shape[-1] == 8
                    and "expression_q" in self.fc_controls):
                routed[group] = ("expression_q", value)
            elif group in self.fc_controls:
                routed[group] = (group, value)
            else:
                raise ValueError(
                    f"no controller for group '{group}'; have "
                    f"{sorted(self.fc_controls)}"
                )
        return routed

    def _build_run(self, heads: tuple[tuple[str, str], ...],
                   input_is_latent: bool, static_noise: bool,
                   output_uint8: bool = False):
        """The raw (unjitted) fused request function — jitted by
        ``_serve_fn`` for live serving, closed over params and exported
        by ``export_artifacts`` for model-code-free serving.
        ``output_uint8``: quantize to uint8 IN-GRAPH — 4x less
        device->host transfer, and batch-16 512px requests over the
        tunnel are transfer-bound (tools/serving_bench.py)."""
        model, spec = self.model, self.spec
        fc = {head: self.fc_controls[head] for _, head in heads}

        def run(params, fc_params, latent, controls, noise1, rng):
            w = (latent if input_is_latent
                 else model.apply(params, latent, method="map_latent"))
            for group, head in heads:
                group_w = fc[head].apply(fc_params[head], controls[group])
                w = insert_group_latent(
                    spec, w, group_w,
                    "expression" if head == "expression_q" else group,
                )
            if static_noise:
                # broadcast the fixed [1,H,W,1] noise planes on device —
                # the host-side expend_noise copy is pure dispatch overhead
                noise = [
                    jnp.broadcast_to(n, (w.shape[0],) + n.shape[1:])
                    for n in noise1
                ]
            else:
                # fresh noise, drawn from PER-ROW keys (fold_in by row
                # index, then by layer) instead of one bucket-shaped draw:
                # row i's noise depends only on (rng, i, layer), so bucket
                # padding cannot change the first n results — the same
                # invariance the static path gets for free
                row_keys = jax.vmap(jax.random.fold_in, (None, 0))(
                    rng, jnp.arange(w.shape[0])
                )
                noise = [
                    jax.vmap(
                        lambda k, _l=li, _s=tuple(n.shape[1:]): jax.random.normal(
                            jax.random.fold_in(k, _l), _s
                        )
                    )(row_keys)
                    for li, n in enumerate(noise1)
                ]
            img, _ = model.apply(
                params, [w], return_latents=True, input_is_latent=True,
                noise=noise, rngs={"noise": rng},
            )
            img01 = jnp.clip(img * 0.5 + 0.5, 0.0, 1.0)
            # third value = the ASSEMBLED latent (reference contract:
            # gen_batch_by_controls returns its pre-synthesis latent_w,
            # controller.py:51-54), not the generator's broadcast w+
            if output_uint8:
                return jnp.round(img01 * 255.0).astype(jnp.uint8), w
            return img01, w

        return run

    def _serve_fn(self, heads: tuple[tuple[str, str], ...],
                  input_is_latent: bool, static_noise: bool,
                  output_uint8: bool = False):
        key = (heads, input_is_latent, static_noise, output_uint8)
        fn = self._serve_cache.get(key)
        if fn is None:
            fn = jax.jit(self._build_run(heads, input_is_latent, static_noise,
                                         output_uint8))
            self._serve_cache[key] = fn
        return fn

    # -- the serving entry point ----------------------------------------------

    def generate(
        self,
        batch_size: int | None = None,
        latent: jax.Array | None = None,
        input_is_latent: bool = False,
        static_noise: bool = True,
        rng: jax.Array | None = None,
        output: str = "float32",
        **controls,
    ):
        """One-dispatch controlled generation.

        Returns ``(images, latent_in, latent_w)`` as numpy, sliced to the
        request size — the ``gen_batch_by_controls`` triple. ``controls``
        values are [n, dim] arrays keyed by group name. ``output``:
        "float32" ([0,1] floats, the reference contract) or "uint8"
        (quantized in-graph; 4x less transfer — batch-16 512px requests
        over a tunnel are transfer-bound, tools/serving_bench.py).
        """
        if output not in ("float32", "uint8"):
            raise ValueError(f"output must be 'float32' or 'uint8', got {output!r}")
        if rng is None:
            rng = jax.random.PRNGKey(np.random.randint(0, 2**31 - 1))
        rng, k_z, k_noise = jax.random.split(rng, 3)

        routed = self._route(controls)
        if batch_size is not None:
            n = int(batch_size)
        elif latent is not None:
            n = int(np.asarray(latent).shape[0])
        elif routed:
            n = len(next(iter(routed.values()))[1])
        else:
            raise ValueError("need batch_size, latent, or at least one control")
        for group, (_, v) in routed.items():
            if len(v) != n:
                raise ValueError(
                    f"control '{group}' has {len(v)} rows for a batch of {n}"
                )

        style_dim = self.config["model_config"].get("latent_size", 512)
        if latent is None:
            if input_is_latent:
                raise ValueError("input_is_latent=True requires `latent`")
            latent = jax.random.normal(k_z, (n, style_dim))
        latent = jnp.asarray(latent, jnp.float32)
        if latent.shape[0] != n:
            raise ValueError(f"latent has {latent.shape[0]} rows for batch {n}")

        bucket = self.bucket_for(n)

        def pad(a: jax.Array) -> jax.Array:
            if a.shape[0] == bucket:
                return a
            fill = jnp.zeros((bucket - a.shape[0],) + a.shape[1:], a.dtype)
            return jnp.concatenate([a, fill], axis=0)

        heads = tuple(sorted((g, h) for g, (h, _) in routed.items()))
        fn = self._serve_fn(heads, input_is_latent, static_noise,
                            output_uint8=(output == "uint8"))
        latent_in = pad(latent)
        controls_in = {g: pad(jnp.asarray(v)) for g, (_, v) in routed.items()}
        if self._shard is not None:
            latent_in = jax.device_put(latent_in, self._shard)
            controls_in = {g: jax.device_put(v, self._shard)
                           for g, v in controls_in.items()}
        img, w_out = fn(
            self.params,
            {h: self.fc_params[h] for _, h in heads},
            latent_in,
            controls_in,
            self.noise,
            k_noise,
        )
        return np.asarray(img[:n]), np.asarray(latent), np.asarray(w_out[:n])

    def _default_group_sets(self) -> list[dict[str, int]]:
        """Group sets worth precompiling/exporting, as {group: control dim}
        maps: every controllable head jointly; when both the 64-d
        'expression' and the 8-class 'expression_q' heads exist, the
        expression_q variant is a second set (both route through the
        'expression' control key, disambiguated by column count)."""
        sets: list[dict[str, int]] = []
        primary: dict[str, int] = {}
        for head in sorted(self.fc_controls):
            group = "expression" if head == "expression_q" else head
            if head == "expression_q" and "expression" in self.fc_controls:
                continue  # collides with the 64-d head: second set below
            primary[group] = 8 if head == "expression_q" else self.control_dim(head)
        if primary:
            sets.append(primary)
        if "expression_q" in self.fc_controls and "expression" in self.fc_controls:
            sets.append({"expression": 8})
        return sets

    def export_artifacts(self, out_dir, groups: list[str] | None = None,
                         buckets: tuple[int, ...] | None = None,
                         static_noise: bool = True,
                         platforms: tuple[str, ...] | None = None,
                         output: str = "float32") -> dict:
        """Bake the fused request executables into portable serving
        artifacts (``jax.export`` StableHLO, weights embedded as
        constants): one ``.bin`` per (group-set, bucket) plus a
        ``manifest.json``. ``load_exported_serving(out_dir)`` then serves
        controlled generation with NO model code — no flax modules, no
        checkpoint loading, no config parsing — which is the TPU-native
        answer to shipping a trained controller to a fleet.

        ``platforms``: lowering targets (e.g. ``("tpu",)``); default = the
        current backend. Returns the manifest dict.
        """
        import json
        from pathlib import Path

        from jax import export as jax_export

        out = Path(out_dir)
        out.mkdir(parents=True, exist_ok=True)
        style_dim = self.config["model_config"].get("latent_size", 512)
        buckets = self.buckets if buckets is None else tuple(sorted(buckets))
        group_sets = ([{g: self.control_dim(g) for g in groups}]
                      if groups is not None else self._default_group_sets())

        entries = []
        for dims in group_sets:
            routed = self._route(
                {g: np.zeros((1, d), np.float32) for g, d in dims.items()}
            )
            heads = tuple(sorted((g, h) for g, (h, _) in routed.items()))
            run = self._build_run(heads, input_is_latent=False,
                                  static_noise=static_noise,
                                  output_uint8=(output == "uint8"))
            fc_params = {h: self.fc_params[h] for _, h in heads}

            def fn(latent, controls, rng, _run=run, _fc=fc_params):
                return _run(self.params, _fc, latent, controls, self.noise, rng)

            for b in buckets:
                exp = jax_export.export(
                    jax.jit(fn),
                    platforms=list(platforms) if platforms else None,
                )(
                    jax.ShapeDtypeStruct((b, style_dim), jnp.float32),
                    {g: jax.ShapeDtypeStruct((b, d), jnp.float32)
                     for g, d in dims.items()},
                    jax.ShapeDtypeStruct((2,), jnp.uint32),
                )
                # dim in the name disambiguates e.g. the 64-d 'expression'
                # head from the 8-class expression_q set; groups=[] exports
                # the uncontrolled z->image path
                tag = ("-".join(f"{g}{d}" for g, d in sorted(dims.items()))
                       or "uncontrolled")
                name = f"serve_{tag}_b{b}.bin"
                (out / name).write_bytes(exp.serialize())
                entries.append({"file": name, "bucket": b, "dims": dims,
                                "platforms": list(exp.platforms)})
                _log.info("exported %s (%s)", name, ", ".join(exp.platforms))

        manifest = {"style_dim": style_dim, "static_noise": static_noise,
                    "output": output, "artifacts": entries}
        (out / "manifest.json").write_text(json.dumps(manifest, indent=1))
        return manifest

    def warmup(self, buckets: tuple[int, ...] | None = None,
               groups: list[str] | None = None):
        """Precompile the serve executables ahead of traffic: one jitted
        (group-set, bucket) executable per ladder rung for the given group
        set (default: every controllable head jointly; when both the 64-d
        'expression' and the 8-class 'expression_q' heads exist, the
        expression_q variant is warmed as a second set)."""
        buckets = self.buckets if buckets is None else tuple(buckets)
        group_sets = ([{g: self.control_dim(g) for g in groups}]
                      if groups is not None else self._default_group_sets())
        for b in buckets:
            for dims in group_sets:
                _log.info("serving warmup: bucket %d, groups %s",
                          b, sorted(dims))
                self.generate(
                    batch_size=b, rng=jax.random.PRNGKey(0),
                    **{g: np.zeros((b, d), np.float32)
                       for g, d in dims.items()},
                )


def load_exported_serving(out_dir) -> "ExportedServing":
    """Open a directory written by ``ServingController.export_artifacts``."""
    return ExportedServing(out_dir)


class ExportedServing:
    """Model-code-free serving from ``export_artifacts`` output.

    Deserializes the baked StableHLO request executables (weights are
    embedded constants) and reproduces ``ServingController.generate``'s
    bucket/pad/slice discipline — same rng split, numerically identical
    results on the same platform. Needs jax only; no flax modules, no
    checkpoints, no configs."""

    def __init__(self, out_dir):
        import json
        from pathlib import Path

        self._dir = Path(out_dir)
        m = json.loads((self._dir / "manifest.json").read_text())
        self.style_dim = int(m["style_dim"])
        self.static_noise = bool(m["static_noise"])
        self.artifacts = m["artifacts"]
        self._cache: dict[str, Any] = {}

    def _fn(self, entry):
        fn = self._cache.get(entry["file"])
        if fn is None:
            from jax import export as jax_export

            fn = jax_export.deserialize(
                (self._dir / entry["file"]).read_bytes()
            ).call
            self._cache[entry["file"]] = fn
        return fn

    def _pick(self, dims: dict[str, int], n: int) -> dict:
        cands = [e for e in self.artifacts
                 if e["dims"] == dims and e["bucket"] >= n]
        if not cands:
            raise ValueError(
                f"no exported artifact for groups {dims} at batch {n}; "
                f"have {[(e['dims'], e['bucket']) for e in self.artifacts]}"
            )
        return min(cands, key=lambda e: e["bucket"])

    def generate(self, batch_size: int | None = None,
                 latent=None, rng=None, **controls):
        controls = {g: np.asarray(v, np.float32) for g, v in controls.items()}
        controls = {g: v[:, None] if v.ndim == 1 else v
                    for g, v in controls.items()}
        if batch_size is not None:
            n = int(batch_size)
        elif latent is not None:
            n = int(np.asarray(latent).shape[0])
        elif controls:
            n = len(next(iter(controls.values())))
        else:
            raise ValueError("need batch_size, latent, or at least one control")
        entry = self._pick({g: int(v.shape[-1]) for g, v in controls.items()}, n)

        if rng is None:
            rng = jax.random.PRNGKey(np.random.randint(0, 2**31 - 1))
        # same split discipline as ServingController.generate
        rng, k_z, k_noise = jax.random.split(rng, 3)
        if latent is None:
            latent = jax.random.normal(k_z, (n, self.style_dim))
        latent = jnp.asarray(latent, jnp.float32)

        b = entry["bucket"]

        def pad(a):
            if a.shape[0] == b:
                return a
            fill = np.zeros((b - a.shape[0],) + a.shape[1:], a.dtype)
            return jnp.concatenate([jnp.asarray(a), jnp.asarray(fill)], axis=0)

        key_data = jnp.asarray(
            jax.random.key_data(k_noise)
            if jnp.issubdtype(k_noise.dtype, jax.dtypes.prng_key)
            else k_noise,
            jnp.uint32,
        )
        img, w_out = self._fn(entry)(
            pad(latent), {g: pad(v) for g, v in controls.items()}, key_data
        )
        return np.asarray(img[:n]), np.asarray(latent), np.asarray(w_out[:n])
