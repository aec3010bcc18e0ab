"""Custom-gradient ops.

``normalize_gradients`` reproduces the reference's autograd Function
(models/functions.py:4-27): identity forward, backward rescales the incoming
gradient by its global L2 norm.  Applied at every TransformerBlock output
(reference layers.py:607-608).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.custom_vjp
def normalize_gradients(x: jax.Array) -> jax.Array:
    return x


def _ng_fwd(x):
    return x, None


def _ng_bwd(_, g):
    norm = jnp.linalg.norm(g.astype(jnp.float32).reshape(-1))
    return ((g.astype(jnp.float32) / (norm + 1e-6)).astype(g.dtype),)


normalize_gradients.defvjp(_ng_fwd, _ng_bwd)
