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


def _block_kernel(x_ref,
                  ln1w, ln1b, wq, bq, wkv, bkv, wo, bo, ln2w, ln2b,
                  g0w1, g0b1, g1w1, g1b1, l1w1, l1b1, l2w1, l2b1,
                  g0w2, g0b2, g1w2, g1b2, l1w2, l1b2, l2w2, l2b2,
                  rep_ref, o_ref, *, n_head: int, k_top: int, fin: int,
                  hidden: int, b_tile: int):
    dt = x_ref.dtype
    d = fin
    hd = d // n_head
    scale = 1.0 / math.sqrt(hd)
    rep = rep_ref[...]
    # fully per-image pipeline (attention AND FFN): peak live VMEM is one
    # image's temporaries instead of the whole tile's hidden-wide FFN
    # activation, which lets a 4-image tile fit the scoped-vmem budget
    # (numerics unchanged — LN and the FFN are row-wise)
    for i in range(b_tile):
        xi = x_ref[i]                                        # (t, d)
        xn = _ln(xi, ln1w, ln1b)
        q = _dot(xn, wq[...], dt) + bq[...]                  # (t, d)
        kv = _dot(xn, wkv[...], dt) + bkv[...]               # (t, 2hd)
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
        y = _dot(o, wo[...], dt) + bo[...]
        x1 = xi + y
        xn2 = _ln(x1, ln2w, ln2b)
        h1 = _moe_linear_tile(xn2, g0w1[...], g0b1[...], g1w1[...],
                              g1b1[...], l1w1[...], l1b1[...], l2w1[...],
                              l2b1[...], rep, k=k_top, fin=fin, dt=dt)
        h1 = gelu_tanh(h1)
        ffn = _moe_linear_tile(h1, g0w2[...], g0b2[...], g1w2[...],
                               g1b2[...], l1w2[...], l1b2[...], l2w2[...],
                               l2b2[...], rep, k=k_top, fin=hidden, dt=dt)
        o_ref[i] = x1 + ffn


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
            dimension_semantics=("parallel",)),
        interpret=interpret,
    )(x, *ws)


def fused_block_compatible(block, p, x,
                           interpret: bool = False) -> Optional[jax.Array]:
    """Dispatch gate for TransformerBlock.forward's eval sparse path:
    fused ``x + attn(ln_1 x) + ffn(ln_2 ·)`` when the block fits the
    kernel's scope, None → XLA composition.

    ``x`` is the selected-token stream (b, t_sel, d).
    """
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
    b, t, _ = x.shape
    if t % 8:
        return None
    # VMEM budget: resident weights are ~6 MB bf16 (Wq/Wo 2 MB each +
    # FFN stack), the gridded stream blocks double-buffer, and the
    # kernel's per-image pipeline keeps only one image's FFN hidden
    # live — a 4-image tile fits at the flagship shape (t=160, d=1024,
    # hidden 2048; the earlier tile-wide FFN form measured 20.5 MB
    # scoped VMEM at b_tile=4 and needed 2).  Small shapes take bigger
    # tiles to amortise launch overhead.
    if t * d >= 16 * 1024:
        b_tile = 4
    else:
        b_tile = 8
    while b_tile > 1 and b % b_tile:
        b_tile //= 2
    if b % b_tile:
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
    return _run(n_head, block.mlp.c_fc.top_k, d, hidden, b_tile, interpret,
                x, *ws)
