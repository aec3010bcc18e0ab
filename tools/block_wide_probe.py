"""Structural variants of the fused block: per-image vs tile-wide dots.

PROBE_BLOCK_ABLATE.jsonl attributes the 3.27-vs-1.4ms kernel gap to the
matmul skeleton itself (dots_only 2.73 ms): the per-image loop issues
~15 small dots per image back-to-back, and the MXU stalls on their
latency, not on FLOPs or VPU transcendentals.  With the scoped-vmem
limit raised to 64 MB, this probe times:

* ``full{4,8}``  — the shipping per-image pipeline at b_tile 4 / 8
* ``wide{4,8,16}`` — row-wise ops (LN, q/kv/out projections, the whole
  MoE FFN) computed TILE-WIDE on (b_tile*t, d) with only the attention
  score/PV dots per image — M grows 4-16x, dot count drops ~4-16x

Appends one JSON line to PROBE_BLOCK_WIDE.jsonl.

Usage: python tools/block_wide_probe.py [batch]
"""
from __future__ import annotations

import functools
import json
import math
import sys

import numpy as np

import jax

sys.path.insert(0, ".")

from image2text_tpu.utils.compile_cache import setup_compile_cache

setup_compile_cache("jaxcache-decode")
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bench_kernels import device_loop_ms, quick_calib
from image2text_tpu.configs.models import (MoEConfig, SelfAttentionConfig,
                                           SelfAttentionType,
                                           TransformerConfig)
from image2text_tpu.models.layers import TransformerBlock
from image2text_tpu.nn.modules import gelu_tanh
from image2text_tpu.ops.fused_block import _gate_and_weights, _ln
from image2text_tpu.ops.fused_moe import _dot, _moe_linear_tile


def _wide_kernel(n_head, k_top, fin, hidden, b_tile, t):
    def kernel(x_ref, *refs):
        o_ref = refs[-1]
        (ln1w, ln1b, wq, bq, wkv, bkv, wo, bo, ln2w, ln2b,
         g0w1, g0b1, g1w1, g1b1, l1w1, l1b1, l2w1, l2b1,
         g0w2, g0b2, g1w2, g1b2, l1w2, l1b2, l2w2, l2b2, rep) = (
            tuple(r[...] for r in refs[:-1]))
        d = fin
        hd = d // n_head
        scale = 1.0 / math.sqrt(hd)
        xt = x_ref[...].reshape(b_tile * t, d)
        dt = xt.dtype
        xn = _ln(xt, ln1w, ln1b)
        q = _dot(xn, wq, dt) + bq                  # (B*t, d)
        kv = _dot(xn, wkv, dt) + bkv               # (B*t, 2hd)
        outs = []
        for i in range(b_tile):
            k = kv[i * t:(i + 1) * t, :hd]
            v = kv[i * t:(i + 1) * t, hd:]
            heads = []
            for h in range(n_head):
                qh = q[i * t:(i + 1) * t, h * hd:(h + 1) * hd]
                s = jax.lax.dot_general(
                    qh, k, dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32) * scale
                s = s.astype(dt).astype(jnp.float32)
                m = jnp.max(s, axis=-1, keepdims=True)
                e = jnp.exp(s - m)
                p_h = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(dt)
                heads.append(jax.lax.dot_general(
                    p_h, v, dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32).astype(dt))
            outs.append(jnp.concatenate(heads, axis=-1))
        o = jnp.concatenate(outs, axis=0)          # (B*t, d)
        y = _dot(o, wo, dt) + bo
        x1 = xt + y
        xn2 = _ln(x1, ln2w, ln2b)
        h1 = _moe_linear_tile(xn2, g0w1, g0b1, g1w1, g1b1, l1w1, l1b1,
                              l2w1, l2b1, rep, k=k_top, fin=fin, dt=dt)
        h1 = gelu_tanh(h1)
        ffn = _moe_linear_tile(h1, g0w2, g0b2, g1w2, g1b2, l1w2, l1b2,
                               l2w2, l2b2, rep, k=k_top, fin=hidden, dt=dt)
        o_ref[...] = (x1 + ffn).reshape(b_tile, t, d)

    return kernel


def _runner(kernel, b_tile, x, ws):
    b, t, d = x.shape
    full = lambda a: pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim)
    in_specs = [pl.BlockSpec((b_tile, t, d), lambda i: (i, 0, 0))]
    in_specs += [full(w) for w in ws]
    f = pl.pallas_call(
        kernel,
        grid=(b // b_tile,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((b_tile, t, d), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, t, d), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 * 1024 * 1024),
    )
    return jax.jit(lambda x_, *ws_: f(x_, *ws_))


def main(batch=256, t_sel=160):
    from image2text_tpu.ops import fused_block as fb

    cfg = TransformerConfig(
        is_causal=False, is_cross_attn=False, is_sparse_attn=False,
        attn_config=SelfAttentionConfig(
            attn_dropout=0.1, bias=False, dropout=0.1, n_head=8,
            n_embd=1024, attn_type=SelfAttentionType.MULTI_QUERY),
        rotator_config=MoEConfig(num_experts=4, proj_features=16,
                                 gate_sizes=[32], ff_mult_factor=2.0,
                                 top_k=2))
    blk = TransformerBlock(cfg, seed=None, n_cls=0)
    p = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16)
        if jnp.issubdtype(a.dtype, jnp.floating) else a,
        blk.init(jax.random.PRNGKey(0)))
    x = 0.3 * jax.random.normal(jax.random.PRNGKey(1),
                                (batch, t_sel, 1024), jnp.bfloat16)
    n_head, k_top, d, hidden, ws = _gate_and_weights(blk, p, x, False)

    out = {"batch": batch, "t_sel": t_sel,
           "calib_before_tflops": round(quick_calib(), 1)}
    runs = {}
    for bt in (4, 8):
        kern = functools.partial(
            fb._block_kernel, n_head=n_head, k_top=k_top, fin=d,
            hidden=hidden, b_tile=bt)
        runs[f"full{bt}"] = (_runner(lambda *a, k_=kern: k_(*a), bt, x, ws))
    for bt in (4, 8, 16):
        runs[f"wide{bt}"] = _runner(
            _wide_kernel(n_head, k_top, d, hidden, bt, t_sel), bt, x, ws)
    ref = None
    for name, run in runs.items():
        def body(i, c, run=run):
            (xx,) = c
            return (xx * 0.9 + run(xx, *ws) * 0.1,)

        try:
            out[f"{name}_ms"] = round(device_loop_ms(body, (x,)), 4)
            y = run(x, *ws)
            if ref is None:
                ref = y
            else:
                out[f"{name}_err"] = round(float(jnp.max(jnp.abs(
                    y.astype(jnp.float32) - ref.astype(jnp.float32)))), 5)
        except Exception as exc:
            out[f"{name}_ms"] = None
            out[f"{name}_fail"] = str(exc)[-160:]
    out["calib_after_tflops"] = round(quick_calib(), 1)
    out["device_kind"] = getattr(jax.devices()[0], "device_kind", "?")
    print(json.dumps(out), flush=True)
    with open("PROBE_BLOCK_WIDE.jsonl", "a") as f:
        f.write(json.dumps(out) + "\n")


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:]))
