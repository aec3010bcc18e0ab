"""Test harness config: force an 8-device virtual CPU mesh.

Multi-chip sharding correctness is validated without TPU hardware via
XLA's host-platform device-count flag, per the project test strategy
(SURVEY.md §4).
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402  (import after env setup)

# The axon TPU plugin ignores the env var; force the platform explicitly.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)

# persistent compilation cache: repeated pytest runs skip recompiles
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache-tests")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
