"""Multi-host scaffolding exercised on the single-process 8-device CPU mesh
(the single-host degenerate case: local shard == global batch)."""

import jax
import jax.numpy as jnp
import numpy as np

from gan_control_tpu.utils import multihost


def test_initialize_single_process_noop():
    idx, count = multihost.initialize()
    assert idx == 0
    assert count == 1


def test_data_parallel_mesh_spans_all_devices():
    mesh = multihost.data_parallel_mesh()
    assert mesh.axis_names == ("data",)
    assert mesh.devices.size == len(jax.devices())


def test_host_local_to_global_roundtrip():
    mesh = multihost.data_parallel_mesh()
    n = mesh.devices.size
    local = np.arange(n * 4, dtype=np.float32).reshape(n, 4)
    arr = multihost.host_local_to_global(local, mesh)
    assert arr.shape == local.shape
    np.testing.assert_array_equal(np.asarray(arr), local)
    # the batch axis really is sharded over the mesh
    assert len(arr.sharding.device_set) == n

    # a psum over the sharded axis sees every row (the gradient all-reduce
    # path of the SPMD train step)
    total = jnp.sum(arr)
    assert float(total) == float(local.sum())
