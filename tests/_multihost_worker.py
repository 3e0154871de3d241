"""Worker for tests/test_multihost.py — one of two cooperating processes
forming a 2-host x 2-device CPU 'slice'.

Modes:
  python _multihost_worker.py <process_id> <coordinator_port>          # utils
  python _multihost_worker.py <process_id> <coordinator_port> trainer  # smoke

'utils' exercises initialize() + host_local_to_global + a cross-host jitted
reduction. 'trainer' runs a REAL 2-process GeneratorTrainer for 3 iterations
on the sharded synthetic loader (each host decodes only its half of the
global batch) and prints the per-iteration metrics — the test asserts both
processes print identical finite values (replicated train state). Prints one
machine-readable RESULT line on success."""

import os
import sys


def main():
    pid, port = int(sys.argv[1]), sys.argv[2]
    mode = sys.argv[3] if len(sys.argv) > 3 else "utils"
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

    import jax

    jax.config.update("jax_platforms", "cpu")  # sitecustomize pins axon
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

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

    if mode == "trainer":
        return trainer_smoke(idx, count, mesh)

    # per-host shard: host 0 contributes rows of 0s, host 1 rows of 1s
    local = np.full((2, 4), float(idx), np.float32)
    arr = multihost.host_local_to_global(local, mesh)
    assert arr.shape == (4, 4), arr.shape  # global batch spans both hosts

    # a jitted reduction over the host-spanning sharded axis (the gradient
    # all-reduce path): sees BOTH hosts' rows
    total = float(jax.jit(jnp.sum)(arr))
    assert total == 8.0, total  # 0*8 + 1*8

    print(f"RESULT {idx} {count} {arr.shape[0]}x{arr.shape[1]} {total}", flush=True)


def trainer_smoke(idx: int, count: int, mesh):
    """3 iterations of the REAL GeneratorTrainer across 2 processes: the
    sharded synthetic loader gives each host half the global batch, the
    train state is replicated over the DCN-spanning mesh, and the SPMD
    steps all-reduce gradients across hosts. Metrics are replicated
    scalars, so both processes must print the SAME values.

    The FID eval runs too — the sharded-FID branch: random-weight
    Inception (the explicit smoke escape) + a synthetic real-stats
    pickle; the [chunk, 2048] features are batch-sharded ACROSS HOSTS
    and all-gathered, so both processes must compute the identical
    score."""
    import shutil
    import tempfile

    import numpy as np

    from gan_control_tpu.evaluation import fid as fid_lib
    from gan_control_tpu.trainers.generator_trainer import GeneratorTrainer

    stats_dir = tempfile.mkdtemp(prefix=f"mh_fid_stats_{idx}_")
    stats_path = f"{stats_dir}/stats.pkl"
    fid_lib.save_stats(
        stats_path, np.zeros((2048,), np.float64), np.eye(2048, dtype=np.float64)
    )

    config = {
        "model_config": {
            "vanilla": False, "img_channels": 3, "split_fc": True,
            "marge_fc": False, "latent_size": 64, "size": 16, "n_mlp": 2,
            "channel_multiplier": 0.25, "max_channels": 32,
            "g_noise_mode": "normal",
        },
        "training_config": {
            "iter": 3, "start_iter": 0, "seed": 0, "batch": 8,
            "mini_batch": 8, "mini_batch_mode": "normal",
            "augment": {"enabled": False},
            "sub_groups_dict": {
                "id": {"place_in_mini_batch": [0, 4], "place_in_latent": [0, 32]},
                "other": {"place_in_mini_batch": [4, 8], "place_in_latent": [32, 64]},
            },
            "r1": 1, "d_every": 1, "g_reg_every": 2, "d_reg_every": 2,
            "lr_g": 0.002, "lr_d": 0.002, "g_moving_average": 100,
            "path_regularize": 2, "path_batch_shrink": 2, "mixing": 0,
        },
        "data_config": {"data_set_name": "synthetic", "path": ""},
        "evaluation_config": {
            "fid": {
                "enabled": True, "inception_stat_path": stats_path,
                "inception_weights": "__random__", "num_of_samples": 16,
                "batch_size": 8,
            },
            "separability": {"enabled": False},
        },
        "tensorboard_config": {"enabled": False},
        "monitor_config": {"enabled": False},
        "ckpt_config": {"enabled": False, "ckpt": "no_ckpt"},
    }

    trainer = GeneratorTrainer(config=config, init_dirs=False, mesh=mesh)
    assert trainer.mesh.devices.size == 4

    vals = []
    for i in range(3):
        metrics = trainer.one_iteration(i)
        vals.append((float(metrics["d_loss"]), float(metrics["g_loss"])))
    assert all(np.isfinite(v) for pair in vals for v in pair), vals

    fid = trainer.evaluate_fid()
    shutil.rmtree(stats_dir, ignore_errors=True)
    assert fid is not None and np.isfinite(fid), fid

    flat = " ".join(f"{v:.6f}" for pair in vals for v in pair)
    print(f"RESULT {idx} {count} trainer {flat} fid={fid:.6f}", flush=True)


if __name__ == "__main__":
    main()
