"""Multi-host (DCN-spanning) scaffolding.

The reference is strictly single-process (nn.DataParallel; its
DistributedSampler branch is dead code — ffhq_dataset.py:39-47, 74). Parity
does not require multi-host, but the SPMD design extends to it: the same
train steps run unchanged once the mesh spans hosts. This module holds the
initialization + mesh/sharding conveniences; GeneratorTrainer is
multi-process aware on top of them (demonstrated by
tests/test_multihost.py::test_two_process_generator_trainer — a real
2-process trainer run with identical replicated metric streams).

Usage on EACH host of a multi-host TPU slice (same code, every process):

    from gan_control_tpu.utils import multihost
    multihost.initialize()                    # jax.distributed handshake
    mesh = multihost.data_parallel_mesh()     # 1-D mesh over ALL chips
    trainer = GeneratorTrainer(config=..., mesh=mesh, init_dirs=...)
    trainer.train()

How the trainer keeps processes in SPMD lockstep (all jitted programs must
be enqueued by every process in the same order):

  - data: each host's loader yields its ``batch // process_count`` row
    slice of the global batch (disjoint IO — data/datasets.infinite_loader
    shards the shared shuffle stream; no host decodes another's rows). An
    injected ``data_loader`` must do the same.
  - host randomness: ``_host_rng`` is seeded identically everywhere; hosts
    replay the same z/decision streams (so mixing_noise's 1-vs-2 style
    count agrees) and contribute only their row shard of the drawn batch.
  - state: replicated via make_array_from_process_local_data (identical on
    every host — same init seed or same restored checkpoint).

Artifact policy: pass the same ``init_dirs`` on every process. With
init_dirs=True give each host its own ``results_dir`` (or a shared FS —
saves are idempotent per host; host 0's copy is canonical): the eval /
image-saving paths run GLOBAL jitted programs, so a save_dir on a strict
subset of processes would diverge the program sequence and deadlock the
collective. FID feature sweeps all-gather their per-host feature shards
(generator_trainer.evaluate_fid) so every host computes the same score.
"""

from __future__ import annotations

import numpy as np


def initialize(**kwargs):
    """jax.distributed.initialize with TPU auto-detection (no-op when the
    coordinator env is absent, so single-host runs work unchanged).

    When the caller EXPLICITLY requested a distributed run (kwargs given,
    or a coordinator env var set), failures RE-RAISE: swallowing a bad
    coordinator address would let every host silently degrade to an
    independent single-process run training divergent models into the
    same save_dir."""
    import os

    import jax

    explicit = bool(kwargs) or any(
        os.environ.get(v)
        for v in ("JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS",
                  "MEGASCALE_COORDINATOR_ADDRESS")
    )
    try:
        jax.distributed.initialize(**kwargs)
    except (RuntimeError, ValueError):
        if explicit:
            raise
        # implicit single-process / already-initialized: proceed local
    return jax.process_index(), jax.process_count()


def data_parallel_mesh(axis_name: str = "data"):
    """1-D mesh over every chip in the slice (ICI within hosts, DCN across)."""
    import jax
    from jax.sharding import Mesh

    return Mesh(np.array(jax.devices()), (axis_name,))


def host_local_to_global(local_batch: np.ndarray, mesh, axis_name: str = "data"):
    """Assemble a globally-sharded array from per-host batch shards
    (the multi-host replacement for jax.device_put(batch, sharding))."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P(axis_name))
    return jax.make_array_from_process_local_data(sharding, local_batch)
