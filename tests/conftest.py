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

# persistent compilation cache: repeated pytest runs skip recompiles.
# Keyed by host CPU flags — XLA:CPU AOT results baked for another machine's
# feature set load with SIGILL risk (observed when /tmp persists across
# differently-featured hosts).
import hashlib  # noqa: E402

import platform  # noqa: E402

try:
    with open("/proc/cpuinfo") as _f:
        # x86 lists 'flags', ARM 'Features'; one line suffices (identical
        # across cores)
        _flags = next((l for l in _f
                       if l.startswith(("flags", "Features"))), "")
except OSError:
    _flags = ""
_cache_key = hashlib.sha1(
    f"{platform.machine()}:{_flags}".encode()).hexdigest()[:10]
jax.config.update("jax_compilation_cache_dir", f"/tmp/jaxcache-tests-{_cache_key}")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def _drain_async_dispatch():
    """Block on every live array after each test.

    JAX dispatch is asynchronous; on the virtual CPU mesh, two collective
    programs in flight at once (one test's teardown overlapping the next
    test's launch) can deadlock XLA's per-device rendezvous (observed as a
    rare `rendezvous.cc` all-gather hang). Draining between tests keeps at
    most one multi-device program in flight.
    """
    yield
    for a in jax.live_arrays():
        try:
            a.block_until_ready()
        except RuntimeError:
            pass  # donated/deleted buffers
