"""Fused sparse-encoder-block Pallas kernel (serving path).

The flagship encoder spends ~83 ms of the 165 ms batch-256 serving window
in its 12 sparse transformer blocks (PROFILE_ENCODER.json) — ~4x the
~21 ms matmul-FLOP floor.  The XLA composition round-trips every
intermediate through HBM: ln_1 out, q/kv projections, head-transposed q,
the (b, h, 160, 160) score tensor (twice), attention out, ln_2 out and
the FFN's hidden-wide activation.  This kernel computes the ENTIRE block
residual chain

    x + attn(ln_1(x))  →  (+ ffn(ln_2(·)))

per batch-tile in VMEM: HBM sees one read of the selected-token stream
and one write of the block output; weights (~6 MB bf16) stay resident.

Numerics mirror the XLA modules exactly in structure (LayerNorm in f32,
f32 MXU accumulation cast to the storage dtype at each projection,
scores materialised in the storage dtype before the f32 softmax — the
torch math-backend form ops/attention.py uses, probabilities dropped to
storage dtype before the V dot, the fused_moe dtype chain for the FFN);
results agree to bf16 rounding of the different accumulation order
(pinned by tests/test_fused_block.py in interpret mode).

Scope (everything else falls back to the XLA path):
* eval only (no dropout; the kernel defines no VJP),
* multi-query attention, no mask, non-causal, no cross-attention — the
  flagship encoder's sparse blocks at serving time,
* MoE FFN with one hidden gate layer (the fused_moe kernel's contract),
* head_dim a lane multiple (128), batch divisible by the tile.

Reference: the block being fused is the TPU re-design of reference
models/layers.py:521-614 (TransformerBlock).
"""
from __future__ import annotations

import functools
import math
import os
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from image2text_tpu.nn.modules import gelu_tanh
from image2text_tpu.ops.fused_moe import (_dot, _flat_weights,
                                          _moe_linear_tile, _supported)


def _ln(x, w, b):
    """nn.modules.LayerNorm numerics: f32 stats, eps 1e-5, f32 scale/shift,
    cast back to the input dtype."""
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + 1e-5)
    y = y * w[...].astype(jnp.float32) + b[...].astype(jnp.float32)
    return y.astype(x.dtype)


def _chain_one(xi, ws, *, n_head: int, k_top: int, fin: int, hidden: int):
    """The per-image block residual chain x + attn(ln_1 x) + ffn(ln_2 ·)
    on one (t, d) image, all operands VMEM values."""
    (ln1w, ln1b, wq, bq, wkv, bkv, wo, bo, ln2w, ln2b,
     g0w1, g0b1, g1w1, g1b1, l1w1, l1b1, l2w1, l2b1,
     g0w2, g0b2, g1w2, g1b2, l1w2, l1b2, l2w2, l2b2, rep) = ws
    dt = xi.dtype
    d = fin
    hd = d // n_head
    scale = 1.0 / math.sqrt(hd)
    xn = _ln(xi, ln1w, ln1b)
    q = _dot(xn, wq, dt) + bq                            # (t, d)
    kv = _dot(xn, wkv, dt) + bkv                         # (t, 2hd)
    k, v = kv[:, :hd], kv[:, hd:]
    heads = []
    for h in range(n_head):
        qh = q[:, h * hd:(h + 1) * hd]                   # (t, hd)
        s = jax.lax.dot_general(
            qh, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale  # (t, t)
        # storage-dtype score materialisation (torch math-backend
        # form, ops/attention.py) then f32 softmax
        s = s.astype(dt).astype(jnp.float32)
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        p_h = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(dt)
        heads.append(jax.lax.dot_general(
            p_h, v, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dt))
    o = jnp.concatenate(heads, axis=-1)                  # (t, d)
    y = _dot(o, wo, dt) + bo
    x1 = xi + y
    xn2 = _ln(x1, ln2w, ln2b)
    h1 = _moe_linear_tile(xn2, g0w1, g0b1, g1w1, g1b1, l1w1, l1b1, l2w1,
                          l2b1, rep, k=k_top, fin=fin, dt=dt)
    h1 = gelu_tanh(h1)
    ffn = _moe_linear_tile(h1, g0w2, g0b2, g1w2, g1b2, l1w2, l1b2, l2w2,
                           l2b2, rep, k=k_top, fin=hidden, dt=dt)
    return x1 + ffn


def _block_kernel(x_ref, *refs, n_head: int, k_top: int, fin: int,
                  hidden: int, b_tile: int):
    o_ref = refs[-1]
    ws = tuple(r[...] for r in refs[:-1])
    # fully per-image pipeline (attention AND FFN): peak live VMEM is one
    # image's temporaries instead of the whole tile's hidden-wide FFN
    # activation, which lets a 4-image tile fit the scoped-vmem budget
    # (numerics unchanged — LN and the FFN are row-wise)
    for i in range(b_tile):
        o_ref[i] = _chain_one(x_ref[i], ws, n_head=n_head, k_top=k_top,
                              fin=fin, hidden=hidden)


def _sparse_block_kernel(x_ref, perm_ref, wn_ref, bn_ref, *refs,
                         n_head: int, k_top: int, fin: int, hidden: int,
                         b_tile: int, t_sel: int):
    """v2: the WHOLE lazy sparse block on the full token stream — the
    select/bypass gathers (as one in-VMEM permutation dot), the fused
    residual chain on the selected rows, the null-connector bypass path,
    and the [sel; byp] output concat.  Replaces ~2 ms/block of XLA-side
    gather + null-linear + concat HBM round-trips at batch 256 (the
    machinery PROFILE_ENC_BLOCK.json's scatter rows measure) with one
    stream read and one stream write.

    Output row order == np.concatenate([idx, not_idx]) canonical ids —
    exactly TransformerBlock.next_layout's lazy contract."""
    dt = x_ref.dtype
    o_ref = refs[-1]
    ws = tuple(r[...] for r in refs[:-1])
    perm = perm_ref[...]
    wn = wn_ref[...]
    bn = bn_ref[...]
    for i in range(b_tile):
        z = _dot(perm, x_ref[i], dt)          # rows → [sel; byp] order
        xs, xb = z[:t_sel], z[t_sel:]
        o_ref[i, :t_sel] = _chain_one(xs, ws, n_head=n_head, k_top=k_top,
                                      fin=fin, hidden=hidden)
        o_ref[i, t_sel:] = xb + (_dot(xb, wn, dt) + bn)


def _zeros_b(n, dt):
    return jnp.zeros((1, n), dt)


def _lin_w(p, dt):
    return p["weight"].T.astype(dt)


def _lin_b(p, n, dt):
    b = p.get("bias")
    return b.reshape(1, n).astype(dt) if b is not None else _zeros_b(n, dt)


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3, 4, 5))
def _run(n_head, k_top, fin, hidden, b_tile, interpret, x, *ws):
    b, t, d = x.shape
    grid = (b // b_tile,)
    full = lambda a: pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim)
    in_specs = [pl.BlockSpec((b_tile, t, d), lambda i: (i, 0, 0))]
    in_specs += [full(w) for w in ws]
    return pl.pallas_call(
        functools.partial(_block_kernel, n_head=n_head, k_top=k_top,
                          fin=fin, hidden=hidden, b_tile=b_tile),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((b_tile, t, d), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, t, d), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(x, *ws)


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3, 4, 5, 6))
def _run_sparse(n_head, k_top, fin, hidden, b_tile, t_sel, interpret,
                x, perm, wn, bn, *ws):
    b, t, d = x.shape
    grid = (b // b_tile,)
    full = lambda a: pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim)
    in_specs = [pl.BlockSpec((b_tile, t, d), lambda i: (i, 0, 0)),
                full(perm), full(wn), full(bn)]
    in_specs += [full(w) for w in ws]
    return pl.pallas_call(
        functools.partial(_sparse_block_kernel, n_head=n_head, k_top=k_top,
                          fin=fin, hidden=hidden, b_tile=b_tile,
                          t_sel=t_sel),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((b_tile, t, d), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, t, d), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            # the fused stream tiles + resident weights legitimately
            # exceed the 16 MB default scoped-vmem budget (measured
            # 18.5 MB at b_tile 2); v5e has 128 MB physical VMEM
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(x, perm, wn, bn, *ws)


def _gate_and_weights(block, p, x, interpret):
    """Shared scope gate + kernel weight prep for both fused-block entry
    points.  Returns (n_head, k_top, d, hidden, ws) or None."""
    from image2text_tpu.models.layers import MultiQueryAttention, _MoEMLP

    if not isinstance(block.attn, MultiQueryAttention):
        return None
    if not isinstance(block.mlp, _MoEMLP):
        return None
    if x.dtype not in (jnp.bfloat16, jnp.float32):
        return None
    if not interpret and (jax.default_backend() != "tpu"
                          or x.dtype != jnp.bfloat16):
        # bf16-serving only on real hardware: an f32 run (e.g. the
        # driver's entry() compile check) doubles every VMEM tile and
        # weight and can blow the scoped-vmem budget the bf16 tiling was
        # sized for; f32 eval stays on the XLA composition (interpret
        # mode still accepts f32 for the CPU parity tests)
        return None
    d = block.attn.n_embd
    n_head = block.attn.n_head
    hd = d // n_head
    if hd % 128 or d % 128:
        return None
    pa, pm = p["attn"], p["mlp"]
    for q in (pa["q_proj"], pa["kv_proj"], pa["out_proj"]):
        if not set(q) <= {"weight", "bias"}:
            return None  # LoRA adapters / W8A8 forms: XLA path only
    if not (_supported(block.mlp.c_fc, pm["c_fc"])
            and _supported(block.mlp.c_proj, pm["c_proj"])):
        return None
    fin = pm["c_fc"]["l1_weight"].shape[2]
    hidden = pm["c_fc"]["l2_weight"].shape[1]
    if fin != d or pm["c_proj"]["l2_weight"].shape[1] != d \
            or pm["c_proj"]["l1_weight"].shape[2] != hidden:
        return None
    if block.mlp.c_fc.top_k != block.mlp.c_proj.top_k \
            or block.mlp.c_fc.num_experts != block.mlp.c_proj.num_experts:
        return None
    dt = x.dtype
    e = pm["c_fc"]["l1_weight"].shape[0]
    r = pm["c_fc"]["l1_weight"].shape[1]
    rep = jnp.asarray(np.kron(np.eye(e), np.ones((1, r))), dt)
    ws = (
        p["ln_1"]["weight"].reshape(1, d),
        (p["ln_1"].get("bias").reshape(1, d) if "bias" in p["ln_1"]
         else _zeros_b(d, jnp.float32)),
        _lin_w(pa["q_proj"], dt), _lin_b(pa["q_proj"], d, dt),
        _lin_w(pa["kv_proj"], dt), _lin_b(pa["kv_proj"], 2 * hd, dt),
        _lin_w(pa["out_proj"], dt), _lin_b(pa["out_proj"], d, dt),
        p["ln_2"]["weight"].reshape(1, d),
        (p["ln_2"].get("bias").reshape(1, d) if "bias" in p["ln_2"]
         else _zeros_b(d, jnp.float32)),
    ) + _flat_weights(block.mlp.c_fc, pm["c_fc"], dt) \
      + _flat_weights(block.mlp.c_proj, pm["c_proj"], dt) + (rep,)
    return n_head, block.mlp.c_fc.top_k, d, hidden, ws


def _pick_b_tile(b, t, d, cap):
    # VMEM budget: resident weights are ~6 MB bf16 (Wq/Wo 2 MB each +
    # FFN stack), the gridded stream blocks double-buffer, and the
    # kernel's per-image pipeline keeps only one image's FFN hidden
    # live — a 4-image tile fits at the flagship shape (t=160, d=1024,
    # hidden 2048; the earlier tile-wide FFN form measured 20.5 MB
    # scoped VMEM at b_tile=4 and needed 2).  Small shapes take bigger
    # tiles to amortise launch overhead.
    b_tile = cap if t * d >= 16 * 1024 else 8
    while b_tile > 1 and b % b_tile:
        b_tile //= 2
    return b_tile if b % b_tile == 0 else None


def fused_block_compatible(block, p, x,
                           interpret: bool = False) -> Optional[jax.Array]:
    """Dispatch gate for TransformerBlock.forward's eval sparse path:
    fused ``x + attn(ln_1 x) + ffn(ln_2 ·)`` when the block fits the
    kernel's scope, None → XLA composition.

    ``x`` is the selected-token stream (b, t_sel, d).
    """
    gw = _gate_and_weights(block, p, x, interpret)
    if gw is None:
        return None
    n_head, k_top, d, hidden, ws = gw
    b, t, _ = x.shape
    if t % 8:
        return None
    b_tile = _pick_b_tile(b, t, d, 4)
    if b_tile is None:
        return None
    return _run(n_head, k_top, d, hidden, b_tile, interpret, x, *ws)


def fused_sparse_block_compatible(block, p, x, layout,
                                  interpret: bool = False
                                  ) -> Optional[jax.Array]:
    """v2 dispatch for the lazy sparse encoder path: the FULL (b, t, d)
    token stream goes through ONE kernel covering select-gather, the
    fused residual chain on the selected rows, the null-connector bypass
    and the [sel; byp] concat.  Returns the output stream whose row
    layout is ``np.concatenate([idx, not_idx])`` (canonical ids) — i.e.
    exactly what TransformerBlock.next_layout announces — or None when
    out of scope (XLA composition path).

    Reference semantics being fused: layers.py:545-563,570-577,609-614
    (sparse token select, null path, combine)."""
    from image2text_tpu.ops.static_gather import layout_rows

    if not getattr(block, "is_sparse", False) or block.null_connector is None:
        return None
    pn = p.get("null_connector")
    if pn is None or not set(pn) <= {"weight", "bias"}:
        return None
    gw = _gate_and_weights(block, p, x, interpret)
    if gw is None:
        return None
    n_head, k_top, d, hidden, ws = gw
    b, t, _ = x.shape
    idx = block.idx_np[block.idx_np < t]
    not_idx = block.not_idx_np[block.not_idx_np < t]
    t_sel = int(idx.shape[0])
    if t_sel <= 1:               # whole-stream null path (layers.py:570)
        return None
    if t % 8 or t_sel % 8 or (t - t_sel) % 8:
        return None              # sublane-aligned sel/byp split only
    # full-stream tiles carry 2x the rows of the v1 kernel plus the null
    # weights — default tile 2 stays inside the scoped-vmem budget
    # (GRAFT_SPARSE_BTILE sweeps it)
    b_tile = _pick_b_tile(b, t, d,
                          int(os.environ.get("GRAFT_SPARSE_BTILE", "2")))
    if b_tile is None:
        return None
    rows_sel = layout_rows(layout, idx)
    rows_byp = layout_rows(layout, not_idx)
    perm_np = np.zeros((t, t), np.float32)
    perm_np[np.arange(t_sel), rows_sel] = 1.0
    perm_np[t_sel + np.arange(t - t_sel), rows_byp] = 1.0
    dt = x.dtype
    perm = jnp.asarray(perm_np, dt)
    wn = _lin_w(pn, dt)
    bn = _lin_b(pn, d, dt)
    return _run_sparse(n_head, k_top, d, hidden, b_tile, t_sel, interpret,
                       x, perm, wn, bn, *ws)
