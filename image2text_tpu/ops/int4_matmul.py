"""Pallas fused int4-dequant matmul.

The TPU replacement for bitsandbytes' NF4 CUDA kernels (reference
models/decoder.py:292-300): frozen weights live PACKED two-4-bit-values-
per-byte in HBM with blockwise fp32 scales, and each weight tile is
unpacked + dequantised in VMEM right before its MXU dot — the full-width
float weight matrix never exists in HBM, so the matmul reads ~4.5× fewer
weight bytes than bf16.

Layout (chosen so the kernel needs NO lane-splitting reshapes — which
Mosaic cannot lower — and the activations need NO permutation):

* packed byte column c holds original column c (LOW nibble) and original
  column in/2 + c (HIGH nibble) — plain half-split;
* a quantisation "block" is the 64-column UNION of the paired 32-column
  strips [b·32, (b+1)·32) ∪ [in/2 + b·32, in/2 + (b+1)·32), so the scale
  layout matches what one packed tile dequantises;
* the kernel reads TWO activation tiles per step (the lows range and the
  highs range — two BlockSpecs over the same x array) and issues two MXU
  dots against the two dequantised nibble planes;
* per-block scales expand to column width via an MXU contraction with a
  constant one-hot expander.

y = x @ dequant(W)ᵀ with x (N, in_pad), W packed (out, in_pad/2), scales
(out, in_pad/64).  Grid (row-tiles, out-tiles, packed-chunk) with fp32
accumulation in VMEM scratch.  The XLA unpack+dot fallback in
models/quantization.py keeps CPU/odd shapes correct.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

QBLOCK = 64          # columns per scale (as a 32+32 strip pair)
STRIP = QBLOCK // 2  # 32

# Forward-path dispatch: "auto" (default) picks per shape from the
# decision-grade round-3 sweep (BENCH_KERNELS.json, calibration-bracketed
# healthy window, every row reproduced by >=2 samples within 15%): the
# fused kernel beats the XLA dequant-dot 1.54× at in=1024 (the
# gpt2-medium c_attn/c_proj fan-in), ties at in=1600 (1.00×) and loses
# slightly at in=4096 (0.94×) — so auto routes fan-in <= 1024 (halfw
# <= 512) to the kernel and wider shapes to XLA.  Against a bf16 dot the
# quantized matmul is 0.58-0.95× everywhere: int4's value is the 4.5×
# weight-byte HBM reduction, not raw speed.  "pallas"/"xla" force one
# path (the env var is read at import; tests set it to cover both).
import os as _os  # noqa: E402

INT4_KERNEL = _os.environ.get("IMAGE2TEXT_INT4_KERNEL", "auto")

# halfw (= in_pad/2) at or below which "auto" picks the fused kernel:
# the measured win boundary above
_AUTO_PALLAS_MAX_HALFW = 512


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def quantize_pack_int4(w: np.ndarray):
    """(out, in) float → packed uint8 (out, in_pad/2) + fp32 scales
    (out, in_pad/QBLOCK) with paired-strip blocks (see module docstring)."""
    out_f, in_f = w.shape
    in_p = _round_up(in_f, QBLOCK)
    wp = np.pad(w.astype(np.float32), ((0, 0), (0, in_p - in_f)))
    half = in_p // 2
    # paired-strip absmax: strips b of the low half and of the high half
    lo = wp[:, :half].reshape(out_f, -1, STRIP)
    hi = wp[:, half:].reshape(out_f, -1, STRIP)
    absmax = np.maximum(np.abs(lo).max(-1), np.abs(hi).max(-1))  # (out, nb)
    scales = (absmax / 7.0).astype(np.float32)
    s_exp = np.repeat(np.maximum(scales, 1e-12), STRIP, axis=1)
    q_lo = np.round(wp[:, :half] / s_exp).astype(np.int16)
    q_hi = np.round(wp[:, half:] / s_exp).astype(np.int16)
    packed = ((q_lo + 8) | ((q_hi + 8) << 4)).astype(np.uint8)
    return packed, scales


def unpack_int4_jnp(packed: jax.Array) -> jax.Array:
    """(out, in_pad/2) uint8 → (out, in_pad) int32, half-split layout."""
    p = packed.astype(jnp.int32)
    low = (p & 0xF) - 8
    high = ((p >> 4) & 0xF) - 8
    return jnp.concatenate([low, high], axis=-1)


def dequantize_int4(packed: jax.Array, scales: jax.Array,
                    dtype=jnp.float32) -> jax.Array:
    """XLA fallback dequant: (out, in_pad) float."""
    out_f, halfw = packed.shape
    q = unpack_int4_jnp(packed).astype(jnp.float32)        # (out, in_pad)
    s = jnp.repeat(scales, STRIP, axis=1).astype(jnp.float32)  # (out, half)
    s2 = jnp.concatenate([s, s], axis=-1)
    return (q * s2).astype(dtype)


def _int4_matmul_kernel(xlo_ref, xhi_ref, w_ref, s_ref, e_ref, o_ref,
                        acc_scr, *, in_blocks):
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _init():
        acc_scr[:] = jnp.zeros_like(acc_scr)

    w_packed = w_ref[:].astype(jnp.int32)                  # (bo, bp)
    s_t = s_ref[0]                                         # (nb_pad, bo)
    s_exp = jax.lax.dot_general(                            # (bo, bp)
        s_t, e_ref[:], dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    w_lo = ((w_packed & 0xF) - 8).astype(jnp.float32) * s_exp
    w_hi = (((w_packed >> 4) & 0xF) - 8).astype(jnp.float32) * s_exp
    acc = acc_scr[:]
    acc += jax.lax.dot_general(
        xlo_ref[:].astype(jnp.float32), w_lo,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    acc += jax.lax.dot_general(
        xhi_ref[:].astype(jnp.float32), w_hi,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    acc_scr[:] = acc

    @pl.when(j == in_blocks - 1)
    def _finish():
        o_ref[:] = acc_scr[:].astype(o_ref.dtype)


def _pick_bp(halfw: int, block_in: int = 1024):
    """Packed-chunk width: full width, or the largest 128-multiple divisor
    when the array is wider than block_in.  Returns None when the result
    would violate Mosaic's last-dim %128 tile rule (kernel ineligible)."""
    bp = halfw
    if halfw > block_in:
        for cand in range(block_in // 128 * 128, 0, -128):
            if halfw % cand == 0:
                bp = cand
                break
    return bp if bp % 128 == 0 else None


@functools.partial(jax.jit, static_argnames=("block_out", "block_in"))
def _int4_matmul_pallas(x: jax.Array, packed: jax.Array, scales: jax.Array,
                        block_out: int = 512, block_in: int = 1024) -> jax.Array:
    """x (..., in_pad) · packed (out, in_pad/2) uint8 · scales
    (out, in_pad/QBLOCK) → (..., out) in x.dtype."""
    *lead, in_p = x.shape
    out_f, halfw = packed.shape
    assert halfw * 2 == in_p, (packed.shape, in_p)
    n = int(np.prod(lead)) if lead else 1
    x2 = x.reshape(n, in_p)

    bn = min(512, _round_up(n, 8))
    n_p = _round_up(n, bn)
    bo = min(block_out, _round_up(out_f, 128))
    bp = _pick_bp(halfw, block_in)
    assert bp is not None, (
        f"int4_matmul dispatched with illegal tile width halfw={halfw}; "
        "the int4_matmul wrapper should have taken the XLA fallback")
    out_p = _round_up(out_f, bo)

    x2 = jnp.pad(x2, ((0, n_p - n), (0, 0)))
    packed_p = jnp.pad(packed, ((0, out_p - out_f), (0, 0)))
    scales_p = jnp.pad(scales, ((0, out_p - out_f), (0, 0)))

    # scales ride as (n_chunks, nb_pad, out_p): 3D blocks tile legally
    # (narrow per-chunk lane slices do not)
    n_chunks = halfw // bp
    nb_c = bp // STRIP
    nb_pad = _round_up(nb_c, 8)
    s_k = scales_p.reshape(out_p, n_chunks, nb_c).transpose(1, 2, 0)
    s_k = jnp.pad(s_k, ((0, 0), (0, nb_pad - nb_c), (0, 0)))

    # constant strip expander: E[b, c] = 1 where packed col c is in strip b
    e = np.zeros((nb_pad, bp), np.float32)
    cols = np.arange(bp)
    e[cols // STRIP, cols] = 1.0

    grid = (n_p // bn, out_p // bo, n_chunks)
    out = pl.pallas_call(
        functools.partial(_int4_matmul_kernel, in_blocks=n_chunks),
        grid=grid,
        in_specs=[
            # lows range of x: cols [j*bp, ...)
            pl.BlockSpec((bn, bp), lambda a, i, j: (a, j),
                         memory_space=pltpu.VMEM),
            # highs range: cols [in/2 + j*bp, ...)
            pl.BlockSpec((bn, bp), lambda a, i, j: (a, j + n_chunks),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bo, bp), lambda a, i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nb_pad, bo), lambda a, i, j: (j, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nb_pad, bp), lambda a, i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bn, bo), lambda a, i, j: (a, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_p, out_p), x.dtype),
        scratch_shapes=[pltpu.VMEM((bn, bo), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * n_p * out_p * in_p,
            bytes_accessed=n_p * in_p * x.dtype.itemsize + out_p * in_p // 2,
            transcendentals=0,
        ),
        interpret=jax.default_backend() != "tpu",
    )(x2, x2, packed_p, s_k, jnp.asarray(e))
    return out[:n, :out_f].reshape(*lead, out_f)


def _int4_matmul_impl(x, packed, scales):
    halfw = packed.shape[1]
    use_pallas = (INT4_KERNEL == "pallas"
                  or (INT4_KERNEL == "auto"
                      and halfw <= _AUTO_PALLAS_MAX_HALFW
                      # the measured win is a TPU number; off-TPU "auto"
                      # would run the kernel in (slow) interpret mode
                      and jax.default_backend() == "tpu"))
    if not use_pallas or _pick_bp(halfw) is None:
        # XLA unpack+dot: the wide-shape path (see INT4_KERNEL above), and
        # the fallback for shapes the kernel declines (packed width not
        # tileable to a 128-multiple, e.g. Falcon's 4544 → halfw 2272)
        w = dequantize_int4(packed, scales, jnp.float32)  # (out, in_pad)
        y = jax.lax.dot_general(
            x.astype(jnp.float32), w,
            dimension_numbers=(((x.ndim - 1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        return y.astype(x.dtype)
    return _int4_matmul_pallas(x, packed, scales)


@jax.custom_vjp
def int4_matmul(x: jax.Array, packed: jax.Array, scales: jax.Array) -> jax.Array:
    """Fused dequant-matmul with autodiff: forward runs the Pallas kernel
    (XLA fallback for shapes it declines); backward dequantises through XLA
    — pallas_call has no transpose rule, and the quantized weights are
    frozen anyway, so only dx is needed (kbit + LoRA training)."""
    return _int4_matmul_impl(x, packed, scales)


def _int4_matmul_fwd(x, packed, scales):
    return _int4_matmul_impl(x, packed, scales), (packed, scales)


def _int4_matmul_bwd(res, g):
    packed, scales = res
    w = dequantize_int4(packed, scales, jnp.float32)      # (out, in_pad)
    dx = jax.lax.dot_general(
        g.astype(jnp.float32), w,
        dimension_numbers=(((g.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    return (dx.astype(g.dtype),
            np.zeros(packed.shape, jax.dtypes.float0),
            jnp.zeros_like(scales))


int4_matmul.defvjp(_int4_matmul_fwd, _int4_matmul_bwd)
