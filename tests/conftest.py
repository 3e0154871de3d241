"""Test config: run everything on a virtual 8-device CPU mesh.

This is the TPU answer to "test multi-chip without a pod": XLA's host
platform is split into 8 virtual devices so `jax.sharding.Mesh` code paths
(shardings, collectives, pjit partitioning) are exercised for real, just on
CPU. Must run before jax is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# A sitecustomize on this box pins JAX_PLATFORMS=axon (remote TPU tunnel);
# override after import so tests run on the local 8-device CPU mesh.
jax.config.update("jax_platforms", "cpu")

# NOTE: x64 is intentionally NOT enabled — it silently promotes every conv
# to float64 on the CPU test backend (minutes-long compiles on this box).
# Parity tests compare f32 results against numpy oracles at f32 tolerances.

# The default conv/matmul precision follows TPU bf16-pass semantics even on
# CPU; parity tests need true f32 accumulation. Production code leaves
# precision to the global config so TPU keeps the fast MXU path.
jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compile cache: repeat pytest runs skip XLA recompilation
# (single-core CPU CI box; compiles dominate wall-clock otherwise).
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
