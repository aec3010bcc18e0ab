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
# (shared across entry points; see utils/compile_cache.py for the
# host-feature cache key rationale)
from image2text_tpu.utils.compile_cache import setup_compile_cache  # noqa: E402

setup_compile_cache()

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
