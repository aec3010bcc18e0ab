"""Persistent XLA compilation-cache setup shared by every entry point.

First compiles of the flagship graphs cost minutes (XLA:CPU on a
single-core host; XLA:TPU through a remote-compile tunnel); the
persistent cache makes second runs near-instant.  The cache key includes
the host CPU feature flags because XLA:CPU AOT results baked for another
machine's feature set load with SIGILL risk when /tmp persists across
differently-featured hosts (observed; see tests/conftest.py).
"""
from __future__ import annotations

import hashlib
import platform

import jax


def setup_compile_cache(prefix: str = "jaxcache-tests") -> str:
    try:
        with open("/proc/cpuinfo") as f:
            # x86 lists 'flags', ARM 'Features'; one line suffices
            # (identical across cores)
            flags = next((l for l in f
                          if l.startswith(("flags", "Features"))), "")
    except OSError:
        flags = ""
    key = hashlib.sha1(
        f"{platform.machine()}:{flags}".encode()).hexdigest()[:10]
    path = f"/tmp/{prefix}-{key}"
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return path
