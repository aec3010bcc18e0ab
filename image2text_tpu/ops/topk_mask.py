"""Fused ngram-ban + exact top-k threshold masking for decode sampling.

The serving sampler's per-step hot op is "ban ≤M token ids, then keep the
top-k of what remains" over (B, 50k) logits (reference
vision_encoder_decoder.py:151-157: ngram processor → `logits < kth → -inf`).
Every sort-based formulation pays far above the one-HBM-pass floor:
full-row ``jax.lax.top_k`` costs 1.05 / 2.15 ms at batch 128 / 256 on a
v5e and the chunked variant 1.9 / 5.2 ms (tools/topk_probe.py →
PROBE_TOPK.jsonl, calibration-bracketed healthy windows), while one pass
over (128, 50304) fp32 is ~0.03 ms at 819 GB/s.

This Pallas kernel is sort-free.  Per 8-row block, entirely in VMEM:

1. mark banned lanes by comparing ≤M banned ids against the lane iota —
   no XLA scatter (row-wise scatters with M index columns lower
   near-serially: measured ~3.4 ms/step at batch 256, L≈85);
2. find the EXACT k-th largest remaining value per row by 32-round
   bisection on a monotone int32 re-key of the float bits (each round is
   one vectorised compare+row-sum over the block — VPU work, no HBM);
3. write logits with banned-or-below-threshold lanes at -inf.

Ties at the threshold are KEPT — exactly the reference's
``logits < kth_value → -inf`` semantics.  The output feeds a plain
full-vocab ``jax.random.categorical`` (or ``argmax`` for greedy).

Non-TPU backends use :func:`topk_ban_mask_reference` — the same math as
one scatter-min + top_k + where; tests pin the kernel bitwise against it
including engineered ties, saturated bans, and k ≥ unbanned-count rows.

Measurement verdict (v5e, healthy window, slope-timed serial chains):
the kernel is bitwise-exact on-chip (random + BPE-clustered + engineered
ties) but LOSES on time — 9.4 / 18.7 ms at batch 128 / 256 vs XLA's
full-row ``lax.top_k`` at 1.05 / 2.15 ms.  The bisection's 31 adaptive
count rounds are irreducible for an exact threshold (each is a
full-width compare + row-reduce ≈ 55 µs at (128, 50304)), and
information-theoretically no bit-bisection does better — so sort-free
exact top-k cannot beat the native TopK emitter at this vocab size.
Kept as a tested negative result: ``use_kernel`` defaults to the jnp
reference on every backend and nothing in the serving path dispatches
here; the serving sampler instead uses the probe-derived full-row
dispatch in models/sampling.py (PROBE_TOPK.jsonl).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

NEG_INF = -jnp.inf
_INT32_MIN = np.int32(-(2 ** 31))
_ROW_BLOCK = 8  # fp32 sublane tile


def _monotone_key(x: jax.Array) -> jax.Array:
    """int32 re-key of fp32 bits preserving float order (signed compare).

    For IEEE-754, non-negative floats already order as int32; negative
    floats order REVERSED, fixed by ``INT32_MIN - bits``.  ±0.0 both map
    to key 0; -inf maps near INT32_MIN; NaNs are callers' problem.
    """
    i = jax.lax.bitcast_convert_type(x, jnp.int32)
    return jnp.where(i >= 0, i, _INT32_MIN - i)


def _kth_key_by_bisection(key: jax.Array, k: int) -> jax.Array:
    """Exact key of the k-th largest element per row, (rows, 1) int32.

    Binary search for the largest threshold c with count(key >= c) >= k;
    over integers that c IS the k-th largest key.  Bit 31 is the sign
    level (offset-binary would overflow signed +), handled first; lower
    bits accumulate from 30 down, and adding 2^b never overflows because
    only unset bits are tested.  Statically unrolled: 31 vector
    compare+row-sum rounds, constants resolved at trace time (Mosaic
    lane-dim loads must be provably aligned, and scalar-core shifts are
    dead weight).
    """
    cnt0 = jnp.sum((key >= 0).astype(jnp.int32), axis=-1, keepdims=True)
    p = jnp.where(cnt0 >= k, np.int32(0), _INT32_MIN)
    for b in range(30, -1, -1):
        cand = p + np.int32(1 << b)
        cnt = jnp.sum((key >= cand).astype(jnp.int32), axis=-1,
                      keepdims=True)
        p = jnp.where(cnt >= k, cand, p)
    return p


def _topk_ban_mask_kernel(x_ref, ban_ref, o_ref, *, k: int, m: int):
    x = x_ref[:]
    rb, v = x.shape
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, v), 1)
    ban = ban_ref[:]                                       # (rb, m)
    xb = x
    for j in range(m):                                     # static unroll
        xb = jnp.where(lane == ban[:, j:j + 1], NEG_INF, xb)
    key = _monotone_key(xb)
    p = _kth_key_by_bisection(key, k)
    o_ref[:] = jnp.where(key < p, NEG_INF, xb)


def topk_ban_mask_reference(logits: jax.Array, banned_id: Optional[jax.Array],
                            k: int) -> jax.Array:
    """jnp formulation with identical output bits: scatter-min the bans,
    threshold at the k-th value, keep ties."""
    b, v = logits.shape
    x = logits.astype(jnp.float32)
    if banned_id is not None and banned_id.shape[-1]:
        idx = jnp.where(banned_id >= 0, banned_id, v)
        x = x.at[jnp.arange(b)[:, None], idx].min(NEG_INF, mode="drop")
    kth = jax.lax.top_k(x, min(k, v))[0][..., -1:]
    return jnp.where(x < kth, NEG_INF, x)


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


BAN_CAP = 32  # static in-kernel ban slots; wider requests gate+compact


def topk_ban_mask(logits: jax.Array, banned_id: Optional[jax.Array], k: int,
                  use_kernel: Optional[bool] = None) -> jax.Array:
    """(B, V) fp32: ``logits`` with banned ids and everything below the
    k-th largest UNBANNED value set to -inf (ties at the threshold kept).

    ``banned_id`` is (B, M) int32 with -1 for empty slots (M static), or
    None.  ``use_kernel=None`` uses the jnp reference on EVERY backend —
    the Pallas kernel measured 9× slower than the full-row sort on a v5e
    (see module docstring) and exists as a tested negative result;
    ``use_kernel=True`` forces it (tests compare bitwise).

    The kernel's ban loop is statically unrolled, so M is capped at
    ``BAN_CAP``: wider ban lists compact their real ids (top_k over the
    tiny (B, M) id array — -1 slots sort last) and a ``lax.cond`` falls
    back to the exact reference path for the rare step where some row
    has more than BAN_CAP live bans — an optimisation, never an
    approximation (same containment pattern as
    sampling.sample_topk_with_ngram's k+margin head).
    """
    b, v = logits.shape
    k = int(min(k, v))
    if not use_kernel:
        return topk_ban_mask_reference(logits, banned_id, k)

    x = logits.astype(jnp.float32)
    if banned_id is None or not banned_id.shape[-1]:
        banned_id = jnp.full((b, 1), -1, jnp.int32)
    if banned_id.shape[-1] > BAN_CAP:
        full = banned_id
        compact = jax.lax.top_k(full, BAN_CAP)[0]
        ok = jnp.all(jnp.sum((full >= 0).astype(jnp.int32), -1) <= BAN_CAP)
        return jax.lax.cond(
            ok,
            lambda args: topk_ban_mask(args[0], args[1], k, use_kernel=True),
            lambda args: topk_ban_mask_reference(args[0], full, k),
            (x, compact))
    m = banned_id.shape[-1]
    pb, pv = _round_up(b, _ROW_BLOCK), _round_up(v, 128)
    if pv != v:
        # padded lanes sit at -inf: never above a threshold unless the
        # whole row is -inf, where keeping them changes nothing
        x = jnp.pad(x, ((0, 0), (0, pv - v)), constant_values=NEG_INF)
    if pb != b:
        x = jnp.pad(x, ((0, pb - b), (0, 0)), constant_values=NEG_INF)
        banned_id = jnp.pad(banned_id, ((0, pb - b), (0, 0)),
                            constant_values=-1)

    out = pl.pallas_call(
        functools.partial(_topk_ban_mask_kernel, k=k, m=m),
        grid=(pb // _ROW_BLOCK,),
        in_specs=[
            pl.BlockSpec((_ROW_BLOCK, pv), lambda i: (i, 0)),
            pl.BlockSpec((_ROW_BLOCK, m), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((_ROW_BLOCK, pv), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((pb, pv), jnp.float32),
        interpret=jax.default_backend() != "tpu",
    )(x, banned_id.astype(jnp.int32))
    return out[:b, :v]
