"""FID pipeline: inception feature stats + Fréchet distance.

Behavior contract (reference fid_utils/):
  - extract_features / extract_feature_from_samples (fid.py:15-40):
    generator samples in [0,1] -> InceptionV3 pool3 features, batched;
  - calc_fid (fid.py:43-67): Fréchet distance with an eps*I retry when the
    covariance product is singular (pytorch-fid semantics);
  - evaluate_fid (evaluate_fid.py:11-37): 50K samples vs a precomputed
    real-set {mean, cov} pickle;
  - calc_inception (calc_inception.py:60-77): build those stats from a real
    dataset loader.

TPU-first: feature extraction is one jitted program over sharded batches;
only the 2048-d features come back to the host. The matrix sqrt runs on the
host in float64 (scipy when available, else eigendecomposition of the
symmetrized product) — it's a 2048x2048 one-shot, not a hot op."""

from __future__ import annotations

import pickle
from pathlib import Path
from typing import Callable, Iterator

import jax
import jax.numpy as jnp
import numpy as np

from gan_control_tpu.evaluation.inception import InceptionV3Features


def make_feature_fn(params):
    """Returns jitted images([0,1] NHWC) -> [B,2048].

    Inception convs run at the configured predictor precision (default
    true-f32: the FID covariance is sensitive to feature scale and the
    reference extracts features with f32 torchvision InceptionV3)."""
    from gan_control_tpu.utils.precision import predictor_precision_ctx

    module = InceptionV3Features()

    # params are a traced argument (closed-over weight trees get baked into
    # the compile payload — oversized on remote-compile links), partially
    # applied so the public contract stays images -> features
    @jax.jit
    def run(p, images):
        with predictor_precision_ctx():
            return module.apply(p, images)

    return lambda images: run(params, images)


def make_sharded_gen_feature_fn(generator, batch: int, style_dim: int,
                                mesh=None, axis: str = "data"):
    """One fused jitted program per FID chunk, sharded over the device mesh.

    Returns ``run(g_params, feature_params, rng) -> [chunk, 2048]`` where
    ``chunk`` (exposed as ``run.batch``) is ``batch`` rounded up to a
    multiple of the mesh size. In-graph: sample z (batch-sharded over the
    1-D ``data`` mesh), synthesize, renorm to [0,1], InceptionV3 pool3 at
    predictor precision — images never leave the devices; only the 2048-d
    features are gathered. The reference's equivalent is two DataParallel
    forwards with a host hop between them (fid_utils/fid.py:15-40).

    Values are deterministic in ``rng`` regardless of mesh size (sharding
    changes layout, not math) — 8-device vs 1-device parity is tested. The
    rng split discipline (k_z, k_noise) matches the trainer's unsharded
    ``_gen_batch`` so FID curves are comparable across mesh sizes.
    """
    import functools

    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from gan_control_tpu.utils.precision import predictor_precision_ctx

    if mesh is None:
        mesh = Mesh(np.array(jax.devices()), (axis,))
    else:
        # honor the caller's mesh axis name; `axis` is only the default
        # for the self-built mesh
        axis = mesh.axis_names[0]
    chunk = -(-batch // mesh.size) * mesh.size
    shard = NamedSharding(mesh, P(axis))
    module = InceptionV3Features()

    @functools.partial(jax.jit, out_shardings=shard)
    def _run(g_params, feature_params, rng):
        k_z, k_noise = jax.random.split(rng)
        z = jax.random.normal(k_z, (chunk, style_dim))
        z = jax.lax.with_sharding_constraint(z, shard)
        img, _ = generator.apply(g_params, [z], rngs={"noise": k_noise})
        # NO clipping: the reference feeds the raw (un-clamped) generator
        # output to InceptionV3(normalize_input=False) (fid_utils/fid.py:
        # 32-35) — StyleGAN2 has no tanh and pixels exceed [-1,1],
        # especially early in training, so clamping would change FID
        # relative to reference-computed curves. The module internally maps
        # [0,1]->[-1,1]; img*0.5+0.5 undoes that exactly, leaving raw pixels.
        img = img * 0.5 + 0.5
        with predictor_precision_ctx():
            return module.apply(feature_params, img)

    def run(g_params, feature_params, rng):
        return _run(g_params, feature_params, rng)

    run.batch = chunk
    return run


def compute_stats(features: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(mean [2048], cov [2048,2048]) in float64."""
    f = np.asarray(features, np.float64)
    return f.mean(axis=0), np.cov(f, rowvar=False)


def _sqrtm_psd(a: np.ndarray) -> np.ndarray:
    """Matrix square root; scipy.linalg.sqrtm when available (pytorch-fid
    parity), else symmetric eigendecomposition. Complex results keep
    their imaginary part so the caller can apply the reference's
    large-imaginary-component check (fid_utils/fid.py:51-57)."""
    try:
        from scipy import linalg

        s, _ = linalg.sqrtm(a, disp=False)
        return s
    except ImportError:
        w, v = np.linalg.eigh((a + a.T) / 2)
        w = np.clip(w, 0, None)
        return (v * np.sqrt(w)) @ v.T


def frechet_distance(mu1, cov1, mu2, cov2, eps: float = 1e-6) -> float:
    """||mu1-mu2||^2 + Tr(C1 + C2 - 2 sqrt(C1 C2)) (fid.py:43-67)."""
    mu1, mu2 = np.asarray(mu1, np.float64), np.asarray(mu2, np.float64)
    cov1, cov2 = np.asarray(cov1, np.float64), np.asarray(cov2, np.float64)
    diff = mu1 - mu2
    cov_sqrt = _sqrtm_psd(cov1 @ cov2)
    if not np.isfinite(cov_sqrt).all():
        offset = np.eye(cov1.shape[0]) * eps
        cov_sqrt = _sqrtm_psd((cov1 + offset) @ (cov2 + offset))
    if np.iscomplexobj(cov_sqrt):
        # reference check (fid_utils/fid.py:51-57): a LARGE imaginary
        # diagonal means sqrtm genuinely failed — raise rather than
        # silently returning an underestimated FID (which could register
        # as best_fid and save a bogus best checkpoint)
        imag_max = float(np.max(np.abs(np.diagonal(cov_sqrt).imag)))
        if imag_max > 1e-3:
            raise ValueError(f"sqrtm has imaginary component {imag_max:g}")
        cov_sqrt = cov_sqrt.real
    return float(diff @ diff + np.trace(cov1) + np.trace(cov2) - 2 * np.trace(cov_sqrt))


def extract_features(
    feature_fn, image_batches: Iterator[np.ndarray], n_samples: int,
    batch_size: int, sharding=None,
) -> np.ndarray:
    """Collect >= n_samples features from [0,1] NHWC batches.

    ``sharding``: optional batch NamedSharding — each host batch is
    committed sharded so the jitted feature program partitions over the
    device mesh (real-dataset stats sweeps, calc_inception.py)."""
    feats = []
    total = 0
    for batch in image_batches:
        if sharding is not None:
            # device_put straight from the host buffer: one direct sharded
            # H2D transfer (asarray-then-put would commit the full batch to
            # device 0 first and then reshard it across the mesh)
            batch = jax.device_put(np.asarray(batch), sharding)
        else:
            batch = jnp.asarray(batch)
        feats.append(np.asarray(feature_fn(batch)))
        total += batch.shape[0]
        if total >= n_samples:
            break
    return np.concatenate(feats, axis=0)[:n_samples]


def extract_features_from_generator(
    gen_batch_fn: Callable[[jax.Array], jax.Array],
    feature_fn,
    n_samples: int,
    batch_size: int,
    rng: jax.Array,
) -> np.ndarray:
    """Features of generator output (gen_batch_fn: rng -> images [0,1]).

    With ``feature_fn=None``, ``gen_batch_fn`` returns features directly
    (the fused sharded program from make_sharded_gen_feature_fn)."""
    feats = []
    for _ in range(-(-n_samples // batch_size)):
        rng, k = jax.random.split(rng)
        out = gen_batch_fn(k)
        feats.append(np.asarray(out if feature_fn is None else feature_fn(out)))
    return np.concatenate(feats, axis=0)[:n_samples]


def load_stats(path: str | Path) -> tuple[np.ndarray, np.ndarray]:
    """Reference inception-stats pickle: {'mean': ..., 'cov': ...}."""
    with open(path, "rb") as f:
        d = pickle.load(f)
    return np.asarray(d["mean"]), np.asarray(d["cov"])


def save_stats(path: str | Path, mean: np.ndarray, cov: np.ndarray):
    with open(path, "wb") as f:
        pickle.dump({"mean": mean, "cov": cov}, f)


def evaluate_fid(
    gen_batch_fn,
    feature_fn,
    real_stats_path: str | Path,
    n_samples: int = 50_000,
    batch_size: int = 64,
    rng: jax.Array | None = None,
) -> float:
    """The reference evaluate_fid contract (evaluate_fid.py:11-37)."""
    rng = jax.random.PRNGKey(0) if rng is None else rng
    mu_real, cov_real = load_stats(real_stats_path)
    feats = extract_features_from_generator(
        gen_batch_fn, feature_fn, n_samples, batch_size, rng
    )
    mu, cov = compute_stats(feats)
    return frechet_distance(mu, cov, mu_real, cov_real)
