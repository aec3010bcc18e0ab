"""Scaled-dot-product attention for TPU.

The XLA einsum path is the always-correct baseline (parity with the
reference's ``disable_flash`` mode, training/utils.py:94); a Pallas flash
kernel (ops/flash_attention.py) is dispatched for shapes that tile onto the
MXU when ``use_flash`` is requested.

Masks are additive fp32 biases broadcastable to (b, h, s, l) — the idiomatic
TPU formulation of the reference's bool/-inf mask gymnastics
(models/vision_encoder_decoder.py:61-111).
"""
from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

from image2text_tpu.nn.core import Ctx, dropout


def sdpa(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mask: Optional[jax.Array] = None,
    dropout_rate: float = 0.0,
    ctx: Ctx = Ctx(),
    use_flash: bool = False,
    causal: bool = False,
) -> jax.Array:
    """Attention with additive mask; q:(b,h,s,d), k/v:(b,hk,l,d), hk ∈ {h, 1}.

    Semantics match torch.nn.functional.scaled_dot_product_attention with a
    float attn_mask (reference layers.py:424,465): probabilities dropout at
    train time, softmax in fp32.  ``causal=True`` adds the decode-window
    causal bias — as an intent flag it lets the flash kernel apply the mask
    in-kernel instead of streaming an O(s²) bias array.
    """
    if use_flash:
        from image2text_tpu.ops.flash_attention import flash_attention_compatible

        if not (ctx.train and dropout_rate > 0.0):
            out = flash_attention_compatible(q, k, v, mask, causal)
            if out is not None:
                return out
        elif ctx.rng is not None and dropout_rate < 1.0:
            # (rate >= 1 drops everything — only the XLA path's
            # jnp.where returns the all-zeros torch F.dropout(p=1) result)
            # training with probability dropout: the kernels apply a
            # deterministic seed-derived keep mask in fwd AND bwd (torch
            # fused-SDPA dropout_p parity at the distribution level; the
            # XLA path draws a different — equally Bernoulli — mask).
            # Consume the ctx stream exactly like nn.core.dropout so the
            # downstream rng stream is unaffected by the dispatch choice.
            ctx, key = ctx.split()
            seed = jax.random.randint(key, (), -2 ** 31, 2 ** 31 - 1,
                                      jnp.int32)
            out = flash_attention_compatible(q, k, v, mask, causal,
                                             dropout_rate, seed)
            if out is not None:
                return out
            # declined: fall through to the XLA path, which draws its own
            # mask from the (already advanced) ctx stream

    if causal:
        cb = causal_bias(q.shape[-2], k.shape[-2])
        mask = cb if mask is None else mask + cb

    d = q.shape[-1]
    scale = 1.0 / math.sqrt(d)
    # MQA/GQA head folding: dot_general cannot broadcast batch dims, so a
    # plain jnp.matmul of q:(b,h,s,d) with k:(b,1,l,d) makes XLA materialise
    # an h-way COPY of K (and V below) — at decode time that is h× the
    # cache's HBM traffic every step.  Folding the per-group query heads
    # into the sequence axis gives matched batch dims; K/V are read once.
    b, h, s, _ = q.shape
    hk = k.shape[1]
    if hk != h:
        g = h // hk
        qf = q.reshape(b, hk, g * s, d)
    else:
        g, qf = 1, q
    # Operands stay in their storage dtype with fp32 ACCUMULATION — on TPU a
    # bf16xbf16->f32 dot is native MXU; pre-casting to f32 materialises f32
    # copies of K/V (2x the HBM read of the decode loop's cached K/V every
    # step) and runs the dot at the much slower f32 MXU rate.  For f32
    # inputs this is identical to the old explicit-cast code; the scale is
    # applied to the f32 scores so no extra operand rounding is introduced.
    scores = jnp.matmul(qf, k.swapaxes(-1, -2),
                        preferred_element_type=jnp.float32) * scale
    if g > 1:
        scores = scores.reshape(b, h, s, -1)
    if q.dtype != jnp.float32:
        # Materialise the (s, l) scores buffer in the storage dtype and
        # upcast inside the softmax pass: torch's math-backend SDPA does
        # exactly this (the bf16 matmul lands in bf16; softmax upcasts
        # internally), so the f32 buffer was extra precision neither torch
        # path has — at 2x the HBM traffic of the XLA path's dominant term
        # (probe: 1.63 → 1.15 ms per encoder block at batch 256,
        # PROFILE_ENC_BLOCK.json).  f32 inputs are untouched.
        scores = scores.astype(q.dtype).astype(jnp.float32)
    if mask is not None:
        scores = scores + mask.astype(jnp.float32)
    # Safe softmax: fully-masked query rows produce zeros rather than NaN,
    # matching torch's fused SDPA kernels (padding-query rows in the
    # reference's training masks rely on this guard).
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - jnp.where(jnp.isneginf(m), 0.0, m))
    denom = jnp.sum(e, axis=-1, keepdims=True)
    # Floor must be large enough that floor**2 does not underflow: the
    # division VJP computes -g*x/y^2, and a denormal floor makes it 0/0=NaN
    # for fully-masked rows.  Any row with >=1 unmasked key has denom >= 1,
    # so 1e-9 never changes real probabilities.
    probs = e / jnp.maximum(denom, 1e-9)
    if ctx.train and dropout_rate > 0.0:
        probs, ctx = dropout(probs, dropout_rate, ctx)
    # Probabilities drop to the storage dtype before the V dot (exactly
    # torch's fused-SDPA behaviour for low-precision inputs); for f32
    # inputs this whole path stays f32 end-to-end.
    pf = probs.astype(q.dtype)
    if g > 1:  # same head folding as the QK dot: read V once
        pf = pf.reshape(b, hk, g * s, -1)
    out = jnp.matmul(pf, v, preferred_element_type=jnp.float32)
    if g > 1:
        out = out.reshape(b, h, s, d)
    return out.astype(q.dtype)


def causal_bias(s: int, l: int, dtype=jnp.float32) -> jax.Array:
    """Additive causal mask of shape (1, 1, s, l): 0 on/below diag, -inf above.

    When s != l the last query row aligns with the last key column (standard
    decode-window semantics).
    """
    row = jnp.arange(s)[:, None] + (l - s)
    col = jnp.arange(l)[None, :]
    neg = jnp.asarray(-jnp.inf, dtype)
    return jnp.where(col <= row, jnp.zeros((), dtype), neg)[None, None]
