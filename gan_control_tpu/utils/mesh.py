"""Small sharding helpers for the host-driven evaluation sweeps.

The training step owns its own mesh plumbing (training/train_step.py);
these helpers exist for the CLI sweeps (calc_inception.py,
make_attributes_df.py) that shard a host-fed batch over whatever devices
are visible — and that must say so OUT LOUD when they cannot, because a
silently-unsharded 100K-sample sweep runs n_devices times slower with no
hint why.
"""

from __future__ import annotations

from gan_control_tpu.utils.logging_utils import get_logger

_log = get_logger(__name__)


def data_batch_sharding(batch: int, label: str = "sweep"):
    """A 1-D 'data'-mesh NamedSharding for a host batch, or None when
    sharding cannot apply — single device, or a batch the device count
    does not divide (the jitted programs need equal per-device shards)."""
    import jax
    import numpy as np

    n_dev = len(jax.devices())
    if n_dev <= 1:
        return None
    if batch % n_dev:
        _log.warning(
            "%s: batch %d is not divisible by the %d visible devices — "
            "running UNSHARDED (%dx slower); pick a divisible batch size",
            label, batch, n_dev, n_dev,
        )
        return None
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    _log.info("%s: sharding batches of %d over %d devices", label, batch, n_dev)
    return NamedSharding(Mesh(np.array(jax.devices()), ("data",)), P("data"))
