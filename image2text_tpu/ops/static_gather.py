"""Static-index sequence gather/scatter as constant one-hot matmuls.

TPU gathers and scatters along the sequence axis lower to row-granular
dynamic-slice loops in XLA and run far from memory bandwidth (measured
2.46 ms per encoder block at batch 256 for the sparse reassembly,
PROFILE_ENC_BLOCK.json, vs a ~0.15 ms copy floor).  When the indices are
known at trace time — the sparse blocks' PCG64 selections are static —
the same data movement is a dot with a compile-time-constant one-hot
matrix, which runs on the MXU at full tile throughput.

Exactness: every output row of the one-hot contraction has exactly one
1.0 multiplicand (1.0 and 0.0 are exact in every float dtype), and the
fp32 accumulation of a single product plus zeros is the identity, so the
results are bitwise equal to ``jnp.take`` / ``.at[].set`` — asserted by
tests/test_static_gather.py.

Reference parity: the reference's sparse blocks perform this selection
with ``x[:, idx]`` advanced indexing and full-buffer index assignment
(reference models/layers.py:560-575); this module is the TPU-native
formulation of the same permutation.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def _matmul_eligible(x) -> bool:
    return x.ndim == 3 and jnp.issubdtype(x.dtype, jnp.floating)


def static_take(x, idx):
    """``jnp.take(x, idx, axis=1)`` for a static ``idx`` over a (b, t, d)
    float array, computed as a constant one-hot matmul (bitwise equal)."""
    idx = np.asarray(idx)
    if not _matmul_eligible(x) or idx.size == 0:
        return jnp.take(x, idx, axis=1)
    t = x.shape[1]
    sel = np.zeros((idx.size, t), np.float32)
    sel[np.arange(idx.size), idx] = 1.0
    return jnp.einsum(
        "st,btd->bsd", jnp.asarray(sel, x.dtype), x,
        preferred_element_type=jnp.float32).astype(x.dtype)


def static_combine(x_sel, x_not, idx, not_idx):
    """Reassemble a full (b, t, d) sequence from the selected-token outputs
    and the bypass outputs: ``out[:, idx] = x_sel; out[:, not_idx] = x_not``
    where ``idx`` ∪ ``not_idx`` partitions ``range(t)`` (static numpy).

    Formulated as one permutation matmul over ``concat([x_sel, x_not])``
    instead of ``zeros_like`` + two scatters; bitwise equal (one-hot rows).
    """
    idx = np.asarray(idx)
    not_idx = np.asarray(not_idx)
    t = idx.size + not_idx.size
    if not_idx.size == 0:
        cat, perm = x_sel, idx
    elif idx.size == 0:
        cat, perm = x_not, not_idx
    else:
        cat = jnp.concatenate([x_sel, x_not], axis=1)
        perm = np.concatenate([idx, not_idx])
    if not _matmul_eligible(cat):
        out = jnp.zeros_like(cat)
        return out.at[:, perm].set(cat)
    mat = np.zeros((t, t), np.float32)
    mat[perm, np.arange(t)] = 1.0
    return jnp.einsum(
        "tc,bcd->btd", jnp.asarray(mat, cat.dtype), cat,
        preferred_element_type=jnp.float32).astype(cat.dtype)


def canonicalize(x, layout):
    """Undo a static row ``layout``: ``out[:, layout[j]] = x[:, j]`` as one
    permutation matmul (bitwise equal to a scatter, like static_combine).

    ``layout`` maps stream row j → canonical sequence position; it is the
    trace-time bookkeeping that lets consecutive sparse blocks skip the
    combine↔take permutation pair entirely (see TransformerBlock's lazy
    path) and reassemble only once at the end of the stack."""
    layout = np.asarray(layout)
    if not _matmul_eligible(x):
        out = jnp.zeros_like(x)
        return out.at[:, layout].set(x)
    t = layout.size
    mat = np.zeros((t, t), np.float32)
    mat[layout, np.arange(t)] = 1.0
    return jnp.einsum(
        "tc,bcd->btd", jnp.asarray(mat, x.dtype), x,
        preferred_element_type=jnp.float32).astype(x.dtype)


def layout_rows(layout, canonical_idx):
    """Stream-row indices holding canonical positions ``canonical_idx``
    under ``layout`` (identity when ``layout`` is None) — composes a
    canonical-index gather with the current lazy layout at trace time."""
    canonical_idx = np.asarray(canonical_idx)
    if layout is None:
        return canonical_idx
    layout = np.asarray(layout)
    pos_of = np.empty(layout.size, np.int64)
    pos_of[layout] = np.arange(layout.size)
    return pos_of[canonical_idx]
