"""Fused low-rank MoE FFN Pallas kernel (serving path).

The flagship's transformer-block FFN (``models/layers.py::_MoEMLP``,
reference layers.py:489-518) is two :class:`MoELinear` layers around a
GELU.  Each MoELinear is *low-rank* (``proj_features`` = 16 on the
flagship), so the FFN's FLOPs are tiny — but the XLA composition
round-trips the ``hidden``-wide activation (2048/4096 on the flagship)
through HBM several times per block: the c_fc output, its GELU, the
c_proj gate-MLP read, and the c_proj l1 read each touch the full
(B·T, hidden) tensor.  At batch 256 the FFN measured 1.7 ms/encoder-block
against a ~0.2 ms read-x/write-out floor (PROFILE_ENC_BLOCK.json) — it is
pure HBM traffic.

This kernel computes the ENTIRE FFN per row-tile in VMEM: gate MLPs,
top-k combine weights, both low-rank expert contractions and both GELUs.
HBM sees exactly one read of x and one write of the output; every weight
is a few hundred KB and stays resident.  Numerics follow the XLA path's
dtype chain (f32 MXU accumulation, cast to the storage dtype at each
einsum output, bias adds in storage dtype, gate softmax in f32) — the
same chain as MoELinear.forward — so results agree to bf16 rounding of
the different accumulation order.

Serving-path only: dispatched from ``_MoEMLP.forward`` when not training
(the kernel implements no dropout and defines no VJP; the XLA composition
remains the training/autodiff path — reference parity is pinned there).

Top-k semantics in-kernel match ``jax.lax.top_k``'s lowest-index
tie-break: expert e's gate value survives iff
``rank(e) = |{j : gv_j > gv_e or (gv_j == gv_e and j < e)}| < k``.
"""
from __future__ import annotations

import functools
import math
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from image2text_tpu.nn.modules import gelu_tanh

ROW_TILE = 256


def _dot(a, b, dt):
    """MXU dot with f32 accumulation, output cast to the storage dtype —
    the same form as nn.modules.Linear / MoELinear's einsums."""
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((a.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dt)


def _topk_combine(gv: jax.Array, k: int) -> jax.Array:
    """Dense combine weights from f32 gate values (T, e): top-k values in
    place, exact zeros elsewhere (lax.top_k lowest-index tie-break)."""
    e = gv.shape[-1]
    cols = []
    for ei in range(e):
        col = gv[:, ei:ei + 1]                                   # (T, 1)
        beats = (gv > col)
        if ei:
            beats = beats | ((gv == col) & (
                jax.lax.broadcasted_iota(jnp.int32, gv.shape, 1) < ei))
        rank = jnp.sum(beats.astype(jnp.int32), axis=-1, keepdims=True)
        cols.append(jnp.where(rank < k, col, jnp.zeros_like(col)))
    return jnp.concatenate(cols, axis=-1)                        # (T, e)


def _moe_linear_tile(x, g0w, g0b, g1w, g1b, l1w, l1b, l2w, l2b, rep,
                     *, k: int, fin: int, dt):
    """One MoELinear on a (T, fin) tile, all operands in VMEM.

    Weight layouts (prepared by the dispatcher):
      g0w (fin, g0)   g0b (1, g0)    — gate MLP hidden
      g1w (g0, e)     g1b (1, e)     — gate MLP out
      l1w (fin, e*r)  l1b (1, e*r)   — stacked expert down-proj (e-major)
      l2w (e*r, fout) l2b (e, fout)  — stacked expert up-proj
      rep (e, e*r)                   — 0/1 expansion: kron(I_e, 1_r)
    """
    a = gelu_tanh(_dot(x, g0w, dt) + g0b)
    lg = _dot(a, g1w, dt) + g1b                                  # (T, e)
    gv = jax.nn.softmax(lg.astype(jnp.float32) / math.sqrt(fin), axis=-1)
    combine = _topk_combine(gv, k).astype(dt)                    # (T, e)
    z = gelu_tanh(_dot(x, l1w, dt) + l1b)                        # (T, e*r)
    hw = z * _dot(combine, rep, dt)                              # fold c into z
    y = _dot(hw, l2w, dt)
    yb = _dot(combine, l2b, dt)
    return y + yb


def _ffn_kernel(x_ref,
                g0w1, g0b1, g1w1, g1b1, l1w1, l1b1, l2w1, l2b1,
                g0w2, g0b2, g1w2, g1b2, l1w2, l1b2, l2w2, l2b2,
                rep_ref, o_ref, *, k: int, fin: int, hidden: int):
    x = x_ref[...]
    dt = x.dtype
    rep = rep_ref[...]
    h = _moe_linear_tile(x, g0w1[...], g0b1[...], g1w1[...], g1b1[...],
                         l1w1[...], l1b1[...], l2w1[...], l2b1[...], rep,
                         k=k, fin=fin, dt=dt)
    h = gelu_tanh(h)
    o_ref[...] = _moe_linear_tile(
        h, g0w2[...], g0b2[...], g1w2[...], g1b2[...],
        l1w2[...], l1b2[...], l2w2[...], l2b2[...], rep,
        k=k, fin=hidden, dt=dt)


def _flat_weights(ml, p, dt):
    """Flatten one MoELinear's params to the kernel layouts above.
    Bias-free gate MLPs (the encoder's ``bias: False`` config) get exact
    zeros — additively identical to the XLA path's missing bias."""
    e = ml.num_experts
    r = p["l1_weight"].shape[1]
    fin = p["l1_weight"].shape[2]
    fout = p["l2_weight"].shape[1]
    g0 = p["expert_gates"]["model"]["0"]["weight"]               # (g0, fin)
    g1 = p["expert_gates"]["model"]["2"]["weight"]               # (e, g0)

    def b_of(q, n):
        b = q.get("bias")
        return (b.reshape(1, n) if b is not None
                else jnp.zeros((1, n))).astype(dt)

    return (
        g0.T.astype(dt),
        b_of(p["expert_gates"]["model"]["0"], g0.shape[0]),
        g1.T.astype(dt),
        b_of(p["expert_gates"]["model"]["2"], g1.shape[0]),
        p["l1_weight"].reshape(e * r, fin).T.astype(dt),
        p["l1_bias"].reshape(1, e * r).astype(dt),
        p["l2_weight"].transpose(0, 2, 1).reshape(e * r, fout).astype(dt),
        p["l2_bias"].astype(dt),
    )


def _supported(ml, p) -> bool:
    """One hidden gate layer, plain (non-LoRA, non-quantized) gate
    linears, lane-aligned features."""
    if len(ml.expert_gates.layer_ids) != 2:
        return False
    for lid in ("0", "2"):
        if not set(p["expert_gates"]["model"][lid]) <= {"weight", "bias"}:
            return False  # LoRA adapters / W8A8 forms: XLA path only
    fin = p["l1_weight"].shape[2]
    fout = p["l2_weight"].shape[1]
    return fin % 128 == 0 and fout % 128 == 0


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3))
def _run(k, fin, hidden, interpret, x2d, *ws):
    n = x2d.shape[0]
    grid = (n // ROW_TILE,)
    full = lambda a: pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim)
    in_specs = [pl.BlockSpec((ROW_TILE, fin), lambda i: (i, 0))]
    in_specs += [full(w) for w in ws]
    return pl.pallas_call(
        functools.partial(_ffn_kernel, k=k, fin=fin, hidden=hidden),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((ROW_TILE, fin), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n, fin), x2d.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=interpret,
    )(x2d, *ws)


def fused_moe_mlp_compatible(mlp, p, x,
                             interpret: bool = False) -> Optional[jax.Array]:
    """Dispatch gate for ``_MoEMLP.forward`` (eval path): fused result
    when the config fits the kernel, None → XLA composition.

    Requirements: square FFN (c_fc fin == c_proj fout), both MoELinears
    with a single hidden gate layer and biases, 128-aligned feature dims,
    bf16/f32 input, TPU backend (or ``interpret=True`` for CPU tests).
    """
    cfc, cproj = mlp.c_fc, mlp.c_proj
    pf, pp = p["c_fc"], p["c_proj"]
    if not (_supported(cfc, pf) and _supported(cproj, pp)):
        return None
    fin = pf["l1_weight"].shape[2]
    hidden = pf["l2_weight"].shape[1]
    if pp["l1_weight"].shape[2] != hidden or pp["l2_weight"].shape[1] != fin:
        return None
    if cfc.top_k != cproj.top_k or cfc.num_experts != cproj.num_experts:
        return None
    if x.dtype not in (jnp.bfloat16, jnp.float32):
        return None
    if not interpret and (jax.default_backend() != "tpu"
                          or x.dtype != jnp.bfloat16):
        # bf16-serving only on real hardware (see fused_block: f32
        # doubles the VMEM tiling the kernel was sized for); interpret
        # mode still accepts f32 for the CPU parity tests
        return None
    # Decision-grade dispatch threshold (PROBE_MOE.jsonl, healthy 187
    # TFLOP/s window, flagship dims): the kernel wins only at large row
    # counts — encoder stream b256·t160 = 40960 rows: 1.44 vs 1.56 ms
    # XLA — and LOSES on decode-step rows (256 rows: 16 vs 10 µs; 1024:
    # 50 vs 31 µs), where launch overhead and the narrow low-rank
    # matmuls (K/N = e·r = 64, half-empty MXU tiles) dominate and XLA
    # overlaps them with the surrounding ops.  Route small row counts
    # to the XLA composition.
    if not interpret and x.size // x.shape[-1] < 4096:
        return None
    dt = x.dtype
    e, r = pf["l1_weight"].shape[0], pf["l1_weight"].shape[1]
    rep = jnp.asarray(np.kron(np.eye(e), np.ones((1, r))), dt)
    ws = _flat_weights(cfc, pf, dt) + _flat_weights(cproj, pp, dt) + (rep,)

    lead = x.shape[:-1]
    x2d = x.reshape(-1, fin)
    n = x2d.shape[0]
    n_pad = -n % ROW_TILE
    if n_pad:
        x2d = jnp.pad(x2d, ((0, n_pad), (0, 0)))
    out = _run(cfc.top_k, fin, hidden, interpret, x2d, *ws)
    if n_pad:
        out = out[:n]
    return out.reshape(*lead, fin)
