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
import os
import platform

import jax

# repo-local cache root: /tmp may be wiped between driver invocations,
# and a cold flagship compile on this single-core host costs minutes —
# keeping the cache next to the code makes every entry point after the
# first near-instant (the dir is gitignored)
_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


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
    base = os.path.join(_REPO_ROOT, ".xla_cache")
    try:
        os.makedirs(base, exist_ok=True)
        path = os.path.join(base, f"{prefix}-{key}")
    except OSError:  # read-only checkout: fall back to /tmp
        path = f"/tmp/{prefix}-{key}"
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return path
