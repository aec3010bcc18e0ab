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
    """Per-layer K/V buffers; ``index`` is the number of filled positions."""

    layers: Tuple[Tuple[jax.Array, jax.Array], ...]
    index: jax.Array  # scalar int32

    @property
    def max_len(self) -> int:
        return self.layers[0][0].shape[2]

    @staticmethod
    def create(layer_shapes: List[Tuple[int, int, int, int]],
               dtype=jnp.float32) -> "KVCache":
        """layer_shapes: per layer (batch, n_kv_heads, max_len, head_dim)."""
        layers = tuple(
            (jnp.zeros(s, dtype), jnp.zeros(s, dtype)) for s in layer_shapes)
        return KVCache(layers=layers, index=jnp.zeros((), jnp.int32))

    def gather_batch(self, order: jax.Array) -> "KVCache":
        """Reorder the batch axis (beam-search consolidation shuffle)."""
        layers = tuple((k[order], v[order]) for k, v in self.layers)
        return KVCache(layers=layers, index=self.index)


class CacheRef:
    """Mutable trace-time view over a :class:`KVCache`.

    One CacheRef serves exactly one decoder forward; attention layers claim
    slots in call order via :meth:`update`.  Call :meth:`advanced` afterwards
    to obtain the functional successor cache.
    """

    def __init__(self, cache: KVCache):
        self._cache = cache
        self._new_layers: List[Tuple[jax.Array, jax.Array]] = list(cache.layers)
        self._layer = 0
        self._t: Optional[int] = None

    @property
    def index(self) -> jax.Array:
        return self._cache.index

    def update(self, k_new: jax.Array, v_new: jax.Array,
               mask: Optional[jax.Array]):
        """Write k/v rows at the fill index; return full (k, v, bias).

        ``bias`` is the additive causal mask over global positions:
        query row i (global position index+i) attends key j iff
        j <= index + i.  Unfilled slots are strictly future, so this also
        masks them.  Any provided ``mask`` (bias over the full cache length)
        is added.
        """
        i = self._layer
        self._layer += 1
        k_buf, v_buf = self._cache.layers[i]
        idx = self._cache.index
        t = k_new.shape[2]
        if self._t is None:
            self._t = t
        else:
            assert self._t == t, "all layers must see the same chunk length"
        k = jax.lax.dynamic_update_slice_in_dim(
            k_buf, k_new.astype(k_buf.dtype), idx, axis=2)
        v = jax.lax.dynamic_update_slice_in_dim(
            v_buf, v_new.astype(v_buf.dtype), idx, axis=2)
        self._new_layers[i] = (k, v)
        max_len = k_buf.shape[2]
        row = idx + jnp.arange(t)[:, None]
        col = jnp.arange(max_len)[None, :]
        bias = jnp.where(col <= row, 0.0, -jnp.inf)[None, None]  # (1,1,t,L)
        if mask is not None:
            bias = bias + mask
        return k, v, bias

    def advanced(self) -> KVCache:
        """The cache after this forward: buffers updated, index advanced."""
        assert self._t is not None, "no layer consumed the cache"
        return KVCache(layers=tuple(self._new_layers),
                       index=self._cache.index + self._t)
