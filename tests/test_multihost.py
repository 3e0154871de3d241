"""Multi-host scaffolding exercised on the single-process 8-device CPU mesh
(the single-host degenerate case: local shard == global batch)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

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


def _run_two_workers(mode_args: list, timeout: float) -> list:
    """Spawn the two cooperating _multihost_worker.py processes and return
    their outputs. The ephemeral-port probe (bind/close, then hand the port
    to jax.distributed) has a TOCTOU window; losing it surfaces as a worker
    failure whose output names the port — keep the scaffolding here so a
    future retry lands in one place."""
    import socket
    import subprocess
    import sys
    from pathlib import Path

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    worker = Path(__file__).parent / "_multihost_worker.py"
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(i), str(port), *mode_args],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out}"
    return outs


def test_two_process_distributed():
    """initialize() + host_local_to_global with process_count==2 for real:
    two cooperating processes form a 2x2-device CPU 'slice', assemble a
    host-spanning global batch, and run a jitted cross-host reduction
    (SURVEY.md §5.8 — the reference has no multi-host path at all)."""
    outs = _run_two_workers([], timeout=180)
    for i, out in enumerate(outs):
        assert f"RESULT {i} 2 4x4 8.0" in out, out


def test_sharded_loader_matches_unsharded(tmp_path):
    """Per-host data sharding invariant (data/datasets.infinite_loader):
    concatenating the two shards' batches reproduces the single-host
    stream bit-for-bit — same shuffle, same per-image augment rng — while
    each shard decodes only half the rows."""
    from PIL import Image

    from gan_control_tpu.data.datasets import ImageFolderDataset, infinite_loader, list_images

    rng = np.random.default_rng(0)
    for i in range(12):
        arr = (rng.random((20, 20, 3)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(tmp_path / f"{i}.png")

    def make(shard, n):
        ds = ImageFolderDataset(list_images(tmp_path), size=16)
        return infinite_loader(ds, 8, workers=2, seed=3,
                               shard_index=shard, num_shards=n)

    full, s0, s1 = make(0, 1), make(0, 2), make(1, 2)
    for _ in range(4):
        want = next(full)
        got = np.concatenate([next(s0), next(s1)], axis=0)
        assert got.shape == want.shape == (8, 16, 16, 3)
        np.testing.assert_array_equal(got, want)

    # synthetic loader: same invariant
    from gan_control_tpu.data.datasets import synthetic_data_loader

    f = synthetic_data_loader(8, 16, seed=5)
    a = synthetic_data_loader(8, 16, seed=5, shard_index=0, num_shards=2)
    b = synthetic_data_loader(8, 16, seed=5, shard_index=1, num_shards=2)
    for _ in range(3):
        np.testing.assert_array_equal(
            np.concatenate([next(a), next(b)], axis=0), next(f)
        )


@pytest.mark.slow
@pytest.mark.nightly
def test_two_process_generator_trainer():
    """The REAL GeneratorTrainer across 2 processes (VERDICT r3 weak #4):
    per-host sharded synthetic loader (each host yields half the global
    batch), replicated train state assembled via
    make_array_from_process_local_data, 3 full iterations (D, R1, G,
    path-length at g_reg_every=2) with cross-host gradient all-reduces.
    Both processes must report IDENTICAL finite metrics — the train state
    is replicated, so any divergence means the hosts fell out of SPMD
    lockstep."""
    # FID adds an Inception compile + a 2048^2 host sqrtm on top of
    # the four trainer-step compiles: give cold caches headroom
    outs = _run_two_workers(["trainer"], timeout=1500)
    results = []
    for i, out in enumerate(outs):
        lines = [l for l in out.splitlines() if l.startswith(f"RESULT {i} 2 trainer")]
        assert lines, out
        results.append(lines[0].split("trainer", 1)[1])
    # replicated state => identical metric streams on both hosts
    assert results[0] == results[1], results
