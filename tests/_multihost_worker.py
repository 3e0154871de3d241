"""Worker for tests/test_multihost.py::test_two_process_distributed — one
of two cooperating processes forming a 2-host x 2-device CPU 'slice'.

Run: python _multihost_worker.py <process_id> <coordinator_port>
Prints one machine-readable RESULT line on success."""

import os
import sys


def main():
    pid, port = int(sys.argv[1]), sys.argv[2]
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

    import jax

    jax.config.update("jax_platforms", "cpu")  # sitecustomize pins axon

    import jax.numpy as jnp
    import numpy as np

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from gan_control_tpu.utils import multihost

    idx, count = multihost.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=2,
        process_id=pid,
    )
    assert idx == pid and count == 2, (idx, count)

    mesh = multihost.data_parallel_mesh()
    assert mesh.devices.size == 4, mesh  # 2 hosts x 2 local devices

    # per-host shard: host 0 contributes rows of 0s, host 1 rows of 1s
    local = np.full((2, 4), float(idx), np.float32)
    arr = multihost.host_local_to_global(local, mesh)
    assert arr.shape == (4, 4), arr.shape  # global batch spans both hosts

    # a jitted reduction over the host-spanning sharded axis (the gradient
    # all-reduce path): sees BOTH hosts' rows
    total = float(jax.jit(jnp.sum)(arr))
    assert total == 8.0, total  # 0*8 + 1*8

    print(f"RESULT {idx} {count} {arr.shape[0]}x{arr.shape[1]} {total}", flush=True)


if __name__ == "__main__":
    main()
