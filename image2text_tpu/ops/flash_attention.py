"""Pallas TPU flash attention (forward).

Online-softmax tiled attention: grid (batch·heads, q-blocks, kv-blocks) with
the kv loop innermost; running max/denominator and the output accumulator
live in VMEM scratch across kv steps, so the (sq, skv) score matrix never
materialises in HBM.  This replaces the reference's reliance on torch SDPA
CUDA flash kernels (reference models/layers.py:424,465); the XLA einsum
path in ops/attention.py remains the ``disable_flash`` parity fallback and
the training path (backward kernel lands in a later milestone — sdpa only
dispatches here when dropout is off, and gradients fall back automatically
via ``flash_attention_compatible`` returning None under ad tracing... we
instead gate on concrete arrays).

Masking: callers pass additive fp32 biases (possibly -inf).  The wrapper
clamps -inf to a large negative finite value; fully-masked rows then
produce a harmless uniform average instead of NaN — the same positions the
reference zeroes out, which never feed the loss (padding rows carry zero
loss weight).

Layout notes (MXU/VPU):
* head_dim is padded to a multiple of 128 lanes (zero K/Q columns do not
  change scores; zero V columns produce zero output columns, sliced off);
* q blocks padded to a multiple of 8 sublanes;
* MQA (1 shared KV head) indexes the same KV block for every query head —
  no broadcast materialisation.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_BIG = -0.7 * float(jnp.finfo(jnp.float32).max)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _flash_kernel(q_ref, k_ref, v_ref, b_ref, o_ref, m_scr, l_scr, acc_scr,
                  *, scale: float, kv_blocks: int, bq: int, bk: int,
                  causal: bool, diag_offset: int):
    ik = pl.program_id(2)
    iq = pl.program_id(1)

    @pl.when(ik == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    if causal:
        # last kv block this q tile can see: col <= row + diag_offset
        last_needed = jnp.minimum(
            (iq * bq + bq - 1 + diag_offset) // bk, kv_blocks - 1)
        active = ik <= last_needed
    else:
        last_needed = kv_blocks - 1
        active = ik <= last_needed

    @pl.when(active)
    def _compute():
        q = q_ref[0]                                   # (bq, d)
        k = k_ref[0]                                   # (bk, d)
        v = v_ref[0]                                   # (bk, d)
        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale  # (bq, bk)
        s = s + b_ref[0]
        if causal:
            rows = iq * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0)
            cols = ik * bk + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
            s = jnp.where(cols <= rows + diag_offset, s, NEG_BIG)

        m_prev = m_scr[:]                              # (bq, 128) lanes equal
        l_prev = l_scr[:]
        m_cur = jnp.max(s, axis=-1, keepdims=True)     # (bq, 1)
        m_new = jnp.maximum(m_prev, jnp.broadcast_to(m_cur, m_prev.shape))
        # guard: fully-masked-so-far rows keep m=-inf; shift by a finite max
        m_safe = jnp.maximum(m_new[:, :1], NEG_BIG)
        p = jnp.exp(s - m_safe)                        # (bq, bk)
        alpha = jnp.exp(jnp.maximum(m_prev, NEG_BIG) - m_safe)  # (bq, 128)
        l_new = alpha * l_prev + jnp.broadcast_to(
            jnp.sum(p, axis=-1, keepdims=True), l_prev.shape)
        acc = acc_scr[:] * alpha[:, :1] + jax.lax.dot_general(
            p.astype(v.dtype), v, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        m_scr[:] = m_new
        l_scr[:] = l_new
        acc_scr[:] = acc

    @pl.when(ik == last_needed)
    def _finish():
        denom = jnp.maximum(l_scr[:, :1], 1e-30)
        o_ref[0] = (acc_scr[:] / denom).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_q", "block_k", "causal"))
def flash_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                    bias: Optional[jax.Array] = None, causal: bool = False,
                    block_q: int = 512, block_k: int = 1024) -> jax.Array:
    """q (b, h, sq, d); k/v (b, hk, skv, d), hk ∈ {h, 1}; additive bias
    broadcastable to (b, h, sq, skv).  Returns (b, h, sq, d) in q.dtype.

    ``causal=True`` applies the decode-window causal mask *inside* the
    kernel (col <= row + skv − sq) and skips kv blocks above the diagonal —
    no O(s²) bias array is materialised or streamed from HBM.

    Default tiles (512×1024) are from an on-chip sweep: measured vs XLA's
    fused attention (bf16, MQA) the kernel is 1.13× faster at s=320,
    3.3× at s=2048, and 4.5× at s=4096; small shapes clamp the tiles to
    the padded sequence lengths."""
    b, h, sq, d = q.shape
    _, hk, skv, _ = k.shape
    assert hk in (1, h)
    scale = 1.0 / (d ** 0.5)

    bq = min(block_q, _round_up(sq, 8))
    bk = min(block_k, _round_up(skv, 128))
    sq_p, skv_p, d_p = _round_up(sq, bq), _round_up(skv, bk), _round_up(d, 128)

    qp = jnp.pad(q, ((0, 0), (0, 0), (0, sq_p - sq), (0, d_p - d)))
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, skv_p - skv), (0, d_p - d)))
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, skv_p - skv), (0, d_p - d)))
    qp = qp.reshape(b * h, sq_p, d_p)
    kp = kp.reshape(b * hk, skv_p, d_p)
    vp = vp.reshape(b * hk, skv_p, d_p)

    # bias: clamp -inf finite, pad kv with NEG_BIG so padded keys vanish
    if bias is None:
        bias = jnp.zeros((1, 1, 1, skv), jnp.float32)
    bias = jnp.maximum(bias.astype(jnp.float32), NEG_BIG)
    bb, bh_, bsq, bskv = bias.shape
    assert bskv == skv, "bias key axis must match kv length"
    bias = jnp.pad(bias, ((0, 0), (0, 0), (0, 0), (0, skv_p - skv)),
                   constant_values=NEG_BIG)
    if bsq not in (1, sq_p):
        bias = jnp.pad(bias, ((0, 0), (0, 0), (0, sq_p - bsq), (0, 0)))
    nb = bb * bh_
    bias = bias.reshape(nb, bias.shape[2], skv_p)

    grid = (b * h, sq_p // bq, skv_p // bk)
    bias_rows = bias.shape[1]
    # CPU (tests / virtual mesh) runs the kernel in interpreter mode
    interpret = jax.default_backend() != "tpu"

    def q_idx(ibh, iq, ik):
        return (ibh, iq, 0)

    def kv_idx(ibh, iq, ik):
        return (ibh if hk == h else ibh // h, ik, 0)

    def b_idx(ibh, iq, ik):
        if nb == 1:
            n = 0
        elif nb == b:
            n = ibh // h
        else:
            n = ibh
        return (n, iq if bias_rows > 1 else 0, ik)

    out = pl.pallas_call(
        functools.partial(_flash_kernel, scale=scale, kv_blocks=grid[2],
                          bq=bq, bk=bk, causal=causal,
                          diag_offset=skv - sq),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, d_p), q_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, d_p), kv_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, d_p), kv_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq if bias_rows > 1 else 1, bk), b_idx,
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, d_p), q_idx, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, sq_p, d_p), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, d_p), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * sq_p * skv_p * d_p,
            bytes_accessed=(b * h * sq_p * d_p * 2 + b * hk * skv_p * d_p * 2)
            * q.dtype.itemsize,
            transcendentals=b * h * sq_p * skv_p,
        ),
        interpret=interpret,
    )(qp, kp, vp, bias)
    return out.reshape(b, h, sq_p, d_p)[:, :, :sq, :d]


def _xla_attention(q, k, v, bias):
    """Reference math for the backward pass (mirrors ops/attention.sdpa's
    no-dropout path, safe softmax included)."""
    d = q.shape[-1]
    scale = 1.0 / (d ** 0.5)
    scores = jnp.matmul(q.astype(jnp.float32) * scale,
                        k.astype(jnp.float32).swapaxes(-1, -2),
                        preferred_element_type=jnp.float32)
    if bias is not None:
        scores = scores + bias.astype(jnp.float32)
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - jnp.where(jnp.isneginf(m), 0.0, m))
    denom = jnp.sum(e, axis=-1, keepdims=True)
    # 1e-9 floor: tiny**2 underflows in the division VJP (0/0=NaN) for
    # fully-masked rows; rows with >=1 unmasked key have denom >= 1
    probs = e / jnp.maximum(denom, 1e-9)
    return jnp.matmul(probs, v.astype(jnp.float32),
                      preferred_element_type=jnp.float32).astype(q.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def flash_sdpa(q, k, v, bias, causal):
    """Flash forward with XLA-recomputed backward (the flash backward
    kernel is a later milestone; the bwd recompute costs one extra XLA
    attention, with standard—not flash—bwd memory)."""
    return flash_attention(q, k, v, bias, causal=causal)


def _flash_sdpa_fwd(q, k, v, bias, causal):
    return flash_attention(q, k, v, bias, causal=causal), (q, k, v, bias)


def _flash_sdpa_bwd(causal, res, g):
    q, k, v, bias = res

    def ref(q_, k_, v_):
        from image2text_tpu.ops.attention import causal_bias

        b = bias
        if causal:
            cb = causal_bias(q_.shape[-2], k_.shape[-2])
            b = cb if b is None else b + cb
        return _xla_attention(q_, k_, v_, b)

    _, vjp = jax.vjp(ref, q, k, v)
    dq, dk, dv = vjp(g)
    db = None if bias is None else jnp.zeros_like(bias)
    return dq, dk, dv, db


flash_sdpa.defvjp(_flash_sdpa_fwd, _flash_sdpa_bwd)


def flash_attention_compatible(q: jax.Array, k: jax.Array, v: jax.Array,
                               mask: Optional[jax.Array],
                               causal: bool = False) -> Optional[jax.Array]:
    """Dispatch gate for ops/attention.sdpa: flash result when the shapes
    suit the kernel, None → XLA fallback (disable_flash parity)."""
    if q.shape[-1] > 256:
        return None
    if mask is not None and (mask.ndim != 4 or mask.shape[-1] != k.shape[-2]):
        return None
    # tiny problems (e.g. single-token decode steps): tiling overhead
    # dominates; let XLA fuse instead
    if q.shape[-2] * k.shape[-2] < 16 * 128:
        return None
    return flash_sdpa(q, k, v, mask, causal)
