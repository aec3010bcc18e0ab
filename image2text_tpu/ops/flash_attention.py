"""Pallas flash-attention for TPU.

``flash_attention_compatible`` is the dispatch gate used by
ops/attention.sdpa: it returns the flash result when the shapes/dtypes tile
onto the MXU, or None to fall back to the XLA einsum path (parity with the
reference's ``disable_flash`` escape hatch, training/utils.py:94).

The kernel itself lands in a later milestone; until then this module always
falls back, keeping behaviour identical.
"""
from __future__ import annotations

from typing import Optional

import jax


def flash_attention_compatible(q: jax.Array, k: jax.Array, v: jax.Array,
                               mask: Optional[jax.Array]) -> Optional[jax.Array]:
    return None  # XLA fallback until the Pallas kernel lands
