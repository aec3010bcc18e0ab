"""Shared ops for the HF decoder family: RMSNorm and rotary embeddings."""
from __future__ import annotations

import jax
import jax.numpy as jnp

from image2text_tpu.nn.core import Module, ones_init


class RMSNorm(Module):
    """Llama/Qwen RMS normalisation (stats in fp32, torch naming)."""

    def __init__(self, dim: int, eps: float = 1e-6):
        super().__init__()
        self.eps = eps
        self.param("weight", (dim,), ones_init())

    def forward(self, p, x, **kwargs):
        x32 = x.astype(jnp.float32)
        var = jnp.mean(jnp.square(x32), axis=-1, keepdims=True)
        y = x32 * jax.lax.rsqrt(var + self.eps)
        # HF casts back to the input dtype BEFORE the weight multiply
        return p["weight"].astype(x.dtype) * y.astype(x.dtype)


def rope_cos_sin(positions: jax.Array, head_dim: int, theta: float,
                 dtype=jnp.float32):
    """cos/sin tables (t, head_dim) in HF half-split layout."""
    inv_freq = 1.0 / (theta ** (
        jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim))
    freqs = positions.astype(jnp.float32)[:, None] * inv_freq[None, :]
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb).astype(dtype), jnp.sin(emb).astype(dtype)


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """x (b, h, t, d); HF rotate_half convention."""
    d = x.shape[-1]
    x1, x2 = x[..., : d // 2], x[..., d // 2:]
    rotated = jnp.concatenate([-x2, x1], axis=-1)
    return x * cos[None, None] + rotated * sin[None, None]
