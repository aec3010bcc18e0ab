"""KV cache for on-device autoregressive decoding.

The reference regenerates the full sequence every step (no KV cache —
reference models/vision_encoder_decoder.py:136-182, O(T²·L) attention); the
TPU-native design decodes with a preallocated static-shape cache driven by
``lax.fori_loop``/``while_loop``:

* :class:`KVCache` — a pytree of per-layer (k, v) buffers with shape
  (b, n_kv_heads, max_len, head_dim) plus a fill index.  Static shapes make
  it a valid jit carry.
* :class:`CacheRef` — a trace-time mutable view handed down the decoder
  call stack.  Attention layers call :meth:`CacheRef.update`, which writes
  the new K/V rows at the fill index and returns the full buffers plus the
  causal-over-global-positions additive bias.  Layers are identified by
  call order, which is deterministic under tracing.

Soft-prompt semantics (why caching is exact): in the scratch decoder the
prefix is *computationally dead* for text logits — text queries never attend
prefix keys and prefix outputs feed only prefix positions (reference
vision_encoder_decoder.py:84-111; image information reaches text through
cross-attention).  So the cached path simply skips prefix positions and
offsets text positions by ``space_for_prompt``.
"""
from __future__ import annotations

from typing import List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp


class KVCache(NamedTuple):
    """Per-layer K/V buffers with *per-layer* fill indices.

    Dense layers advance their index by the chunk length every step; sparse
    layers advance only when the token's position is in that layer's static
    selection (their buffers hold slots for selected text positions only)."""

    layers: Tuple[Tuple[jax.Array, jax.Array], ...]
    index: jax.Array  # (n_layers,) int32

    @property
    def max_len(self) -> int:
        return self.layers[0][0].shape[2]

    @staticmethod
    def create(layer_shapes: List[Tuple[int, int, int, int]],
               dtype=jnp.float32) -> "KVCache":
        """layer_shapes: per layer (batch, n_kv_heads, max_len, head_dim)."""
        layers = tuple(
            (jnp.zeros(s, dtype), jnp.zeros(s, dtype)) for s in layer_shapes)
        return KVCache(layers=layers,
                       index=jnp.zeros((len(layers),), jnp.int32))

    def gather_batch(self, order: jax.Array) -> "KVCache":
        """Reorder the batch axis (beam-search consolidation shuffle)."""
        layers = tuple((k[order], v[order]) for k, v in self.layers)
        return KVCache(layers=layers, index=self.index)


class CacheRef:
    """Mutable trace-time view over a :class:`KVCache`.

    One CacheRef serves exactly one decoder forward; attention layers claim
    slots in call order via :meth:`update`.  Call :meth:`advanced` afterwards
    to obtain the functional successor cache.

    ``positions`` (set by the decoder) carries the chunk's global positions
    so sparse blocks can resolve their static token selections.
    """

    def __init__(self, cache: KVCache):
        self._cache = cache
        self._new_layers: List[Tuple[jax.Array, jax.Array]] = list(cache.layers)
        self._advances: List = [None] * len(cache.layers)
        self._layer = 0
        self.positions = None  # chunk global positions (np or jnp array)

    @property
    def index(self) -> jax.Array:
        return self._cache.index

    def update(self, k_new: jax.Array, v_new: jax.Array,
               mask: Optional[jax.Array], write=None):
        """Write k/v rows at this layer's fill index; return (k, v, bias).

        ``bias`` is the additive causal mask over slots: query row i (slot
        index+i) attends slot j iff j <= index + i.  Unfilled slots are
        strictly future, so this also masks them.  Any provided ``mask``
        (bias over the full cache length) is added.

        ``write`` (optional traced bool) gates the write for sparse layers
        during single-token decode: when False the buffers and index are
        unchanged and the returned bias keeps only already-filled slots —
        the attention output for that token is discarded by the caller.
        """
        i = self._layer
        self._layer += 1
        k_buf, v_buf = self._cache.layers[i]
        idx = self._cache.index[i]
        t = k_new.shape[2]
        if write is not None:
            assert t == 1, "gated writes are single-token decode only"
            w = jnp.asarray(write)
            # gate the ROW, not the buffer: selecting between the updated
            # and original full buffers (jnp.where over (b,h,L,d)) costs a
            # full read+write of the cache per layer per decode step; a
            # write-disabled step instead writes the slot's EXISTING row
            # back — one row of traffic, and XLA still updates the loop
            # carry in place
            old_k = jax.lax.dynamic_slice_in_dim(k_buf, idx, t, axis=2)
            old_v = jax.lax.dynamic_slice_in_dim(v_buf, idx, t, axis=2)
            k_new = jnp.where(w, k_new.astype(k_buf.dtype), old_k)
            v_new = jnp.where(w, v_new.astype(v_buf.dtype), old_v)
            advance = w.astype(jnp.int32)
            row = idx + advance - 1 + jnp.arange(t)[:, None]
        else:
            advance = jnp.asarray(t, jnp.int32)
            row = idx + jnp.arange(t)[:, None]
        k = jax.lax.dynamic_update_slice_in_dim(
            k_buf, k_new.astype(k_buf.dtype), idx, axis=2)
        v = jax.lax.dynamic_update_slice_in_dim(
            v_buf, v_new.astype(v_buf.dtype), idx, axis=2)
        self._new_layers[i] = (k, v)
        self._advances[i] = advance
        max_len = k_buf.shape[2]
        col = jnp.arange(max_len)[None, :]
        bias = jnp.where(col <= row, 0.0, -jnp.inf)[None, None]  # (1,1,t,L)
        if mask is not None:
            bias = bias + mask
        return k, v, bias

    def skip(self) -> None:
        """Claim this layer's slot without touching it (a sparse layer whose
        chunk contains no selected positions still must keep call order)."""
        self._advances[self._layer] = jnp.zeros((), jnp.int32)
        self._layer += 1

    def advanced(self) -> KVCache:
        """The cache after this forward: buffers updated, indices advanced."""
        assert any(a is not None for a in self._advances), \
            "no layer consumed the cache"
        adv = jnp.stack([jnp.asarray(a if a is not None else 0, jnp.int32)
                         for a in self._advances])
        return KVCache(layers=tuple(self._new_layers),
                       index=self._cache.index + adv)
