"""Multi-host (DCN-spanning) scaffolding.

The reference is strictly single-process (nn.DataParallel; its
DistributedSampler branch is dead code — ffhq_dataset.py:39-47, 74). Parity
does not require multi-host, but the SPMD design extends to it for free:
the same train steps run unchanged once the mesh spans hosts. This module
holds the initialization + mesh/sharding conveniences.

Usage on each host of a multi-host TPU slice:

    from gan_control_tpu.utils import multihost
    multihost.initialize()                    # jax.distributed handshake
    mesh = multihost.data_parallel_mesh()     # 1-D mesh over ALL chips
    trainer = GeneratorTrainer(config=..., mesh=mesh)
    # feed each host its own shard of the global batch:
    global_batch = multihost.host_local_to_global(local_batch, mesh)
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
