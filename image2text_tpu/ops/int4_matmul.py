"""Pallas fused int4-dequant matmul.

The TPU replacement for bitsandbytes' NF4 CUDA kernels (reference
models/decoder.py:292-300): frozen weights live PACKED two-4-bit-values-
per-byte in HBM with blockwise fp32 scales, and each weight tile is
unpacked + dequantised in VMEM right before its MXU dot — the full-width
float weight matrix never exists in HBM, so the matmul reads ~4.5× fewer
weight bytes than bf16.

Packing layout (per-quant-block half-split, order-preserving): within each
QBLOCK=64-column quantisation block, columns [0, 32) live in the LOW
nibbles and columns [32, 64) in the HIGH nibbles of 32 bytes — so any tile
whose boundary is a QBLOCK multiple unpacks independently, and unpacking is
two shifts and an in-block concat (no interleave relayout).

y = x @ dequant(W)ᵀ with x (N, in), W packed (out, in/2), scales
(out, in/QBLOCK).  Grid (out-tiles, in-tiles) with fp32 accumulation in
VMEM scratch.  The XLA unpack+dot fallback in models/quantization.py keeps
CPU/odd shapes correct.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

QBLOCK = 64  # quantization block (columns per scale)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def pack_int4(q: np.ndarray) -> np.ndarray:
    """int8 (out, in_pad) in [-8, 7] → uint8 (out, in_pad/2), per-QBLOCK
    half-split (in_pad must be a multiple of QBLOCK)."""
    out_f, in_p = q.shape
    assert in_p % QBLOCK == 0
    u = (q.astype(np.int16) + 8).astype(np.uint8).reshape(out_f, -1, QBLOCK)
    h = QBLOCK // 2
    packed = u[:, :, :h] | (u[:, :, h:] << 4)
    return packed.reshape(out_f, in_p // 2)


def unpack_int4_np(packed: np.ndarray) -> np.ndarray:
    out_f = packed.shape[0]
    p = packed.reshape(out_f, -1, QBLOCK // 2)
    low = (p & 0xF).astype(np.int16) - 8
    high = ((p >> 4) & 0xF).astype(np.int16) - 8
    return np.concatenate([low, high], axis=-1).reshape(
        out_f, -1).astype(np.int8)


def unpack_int4_jnp(packed: jax.Array) -> jax.Array:
    """(..., cols) uint8 → (..., 2*cols) int32, per-QBLOCK half-split."""
    *lead, cols = packed.shape
    p = packed.astype(jnp.int32).reshape(*lead, -1, QBLOCK // 2)
    low = (p & 0xF) - 8
    high = ((p >> 4) & 0xF) - 8
    return jnp.concatenate([low, high], axis=-1).reshape(*lead, 2 * cols)


def _int4_matmul_kernel(x_ref, w_ref, s_ref, e_ref, o_ref, acc_scr, *,
                        in_blocks, bi: int):
    """Lane-layout-friendly tile math (no lane-splitting reshapes, which
    Mosaic cannot lower):

    * unpack = two shift/mask ops + a full-width CONCAT, yielding the tile's
      columns in [all block-lows | all block-highs] order — the wrapper
      pre-permutes x's columns identically, so the dot contracts correctly;
    * per-QBLOCK scale expansion = an MXU matmul with a constant one-hot
      expander E (nb, bi) matching that concat order.
    """
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        acc_scr[:] = jnp.zeros_like(acc_scr)

    w_packed = w_ref[:].astype(jnp.int32)                # (bo, bi/2)
    low = (w_packed & 0xF) - 8
    high = ((w_packed >> 4) & 0xF) - 8
    w_int = jnp.concatenate([low, high], axis=-1).astype(jnp.float32)
    s_t = s_ref[0]                                       # (nb_pad, bo)
    s_exp = jax.lax.dot_general(                          # (bo, bi)
        s_t, e_ref[:], dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    w = w_int * s_exp
    acc_scr[:] += jax.lax.dot_general(
        x_ref[:].astype(jnp.float32), w,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(j == in_blocks - 1)
    def _finish():
        o_ref[:] = acc_scr[:].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_out", "block_in"))
def int4_matmul(x: jax.Array, packed: jax.Array, scales: jax.Array,
                block_out: int = 256, block_in: int = 2048) -> jax.Array:
    """x (..., in_pad) · packed (out, in_pad/2) uint8 · scales
    (out, in_pad/QBLOCK) → (..., out) in x.dtype."""
    *lead, in_p = x.shape
    out_f, half = packed.shape
    assert half * 2 == in_p, (packed.shape, in_p)
    n = int(np.prod(lead)) if lead else 1
    x2 = x.reshape(n, in_p)

    n_p = _round_up(n, 8)
    bo = min(block_out, _round_up(out_f, 128))
    # largest 128-multiple divisor of in_p within the budget (Mosaic wants
    # the last block dim 128-divisible); full width is always legal
    bi = in_p
    if in_p > block_in:
        for cand in range(block_in // 128 * 128, 0, -128):
            if in_p % cand == 0:
                bi = cand
                break
    out_p = _round_up(out_f, bo)

    x2 = jnp.pad(x2, ((0, n_p - n), (0, 0)))
    packed_p = jnp.pad(packed, ((0, out_p - out_f), (0, 0)))
    scales_p = jnp.pad(scales, ((0, out_p - out_f), (0, 0)))
    # permute x's columns to match the kernel's concat-unpack order: within
    # each bi-chunk, [all QBLOCK-lows (first halves) | all QBLOCK-highs]
    half = QBLOCK // 2
    perm = np.empty(in_p, np.int32)
    nb_c = bi // QBLOCK
    for c in range(in_p // bi):
        base = c * bi
        lows = np.concatenate([np.arange(base + b * QBLOCK,
                                         base + b * QBLOCK + half)
                               for b in range(nb_c)])
        perm[base: base + bi // 2] = lows
        perm[base + bi // 2: base + bi] = lows + half
    x2 = jnp.take(x2, jnp.asarray(perm), axis=1)

    # scales ride as (n_chunks, nb_pad, out_p) — 3D blocks tile legally
    # (narrow per-chunk lane slices do not); nb pads to a sublane multiple
    n_chunks = in_p // bi
    nb_pad = _round_up(nb_c, 8)
    s_k = scales_p.reshape(out_p, n_chunks, nb_c).transpose(1, 2, 0)
    s_k = jnp.pad(s_k, ((0, 0), (0, nb_pad - nb_c), (0, 0)))

    # constant scale expander in the concat order (zero rows pad nb → nb_pad):
    # E[b, col] = 1 where col belongs to quant block b
    e = np.zeros((nb_pad, bi), np.float32)
    cols = np.arange(bi)
    blk = np.where(cols < bi // 2, cols // half, (cols - bi // 2) // half)
    e[blk, cols] = 1.0

    grid = (out_p // bo, n_chunks)
    out = pl.pallas_call(
        functools.partial(_int4_matmul_kernel, in_blocks=grid[1], bi=bi),
        grid=grid,
        in_specs=[
            pl.BlockSpec((n_p, bi), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bo, bi // 2), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nb_pad, bo), lambda i, j: (j, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nb_pad, bi), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n_p, bo), lambda i, j: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_p, out_p), x.dtype),
        scratch_shapes=[pltpu.VMEM((n_p, bo), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * n_p * out_p * in_p,
            bytes_accessed=n_p * in_p * x.dtype.itemsize + out_p * in_p // 2,
            transcendentals=0,
        ),
        interpret=jax.default_backend() != "tpu",
    )(x2, packed_p, s_k, jnp.asarray(e))
    return out[:n, :out_f].reshape(*lead, out_f)
