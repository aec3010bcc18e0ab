"""In-kernel ablation of the fused sparse-block chain: where do the
non-MXU milliseconds go?

PROBE_BLOCK.jsonl has the fused chain at 3.05 ms/block (b=256, t_sel=160)
vs a ~1.3-1.4 ms pure-matmul floor, and the two round-4 follow-ups
(head-major score fold, per-image FFN pipeline) measured neutral.  This
probe rebuilds the kernel with pieces ablated to attribute the remainder:

* ``full``        — the shipping chain (baseline; == PROBE_BLOCK number)
* ``no_gelu``     — every gelu_tanh replaced by 0.5*x (linear)
* ``no_softmax``  — softmax replaced by a scale multiply (dots kept)
* ``no_ln``       — LayerNorms replaced by identity
* ``dots_only``   — all three ablations together (matmul skeleton)
* ``exp2``        — softmax exp computed as exp2(x*log2e) (candidate fix)
* ``glu_sig``     — gelu approximated as x*sigmoid(1.702x) (attribution
                    of tanh-vs-sigmoid transcendental cost, NOT shippable)

Each variant runs the same per-image pipeline and tile layout as
ops/fused_block.py so deltas attribute cleanly.  Appends one JSON line to
PROBE_BLOCK_ABLATE.jsonl.

Usage: python tools/block_ablate_probe.py [batch]
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
from image2text_tpu.ops.fused_block import (_gate_and_weights, _ln, _zeros_b)
from image2text_tpu.ops.fused_moe import _dot, _topk_combine


def _mk_moe(act, x, g0w, g0b, g1w, g1b, l1w, l1b, l2w, l2b, rep, *, k, fin,
            dt):
    a = act(_dot(x, g0w, dt) + g0b)
    lg = _dot(a, g1w, dt) + g1b
    gv = jax.nn.softmax(lg.astype(jnp.float32) / math.sqrt(fin), axis=-1)
    combine = _topk_combine(gv, k).astype(dt)
    z = act(_dot(x, l1w, dt) + l1b)
    hw = z * _dot(combine, rep, dt)
    return _dot(hw, l2w, dt) + _dot(combine, l2b, dt)


def _make_kernel(n_head, k_top, fin, hidden, b_tile, *, gelu_mode, sm_mode,
                 ln_mode):
    from image2text_tpu.nn.modules import gelu_tanh

    if gelu_mode == "off":
        act = lambda x: x * jnp.asarray(0.5, x.dtype)
    elif gelu_mode == "sig":
        act = lambda x: x * jax.nn.sigmoid(1.702 * x.astype(jnp.float32)
                                           ).astype(x.dtype)
    else:
        act = gelu_tanh

    ln = (lambda x, w, b: x) if ln_mode == "off" else _ln

    def kernel(x_ref, *refs):
        o_ref = refs[-1]
        ws = tuple(r[...] for r in refs[:-1])
        (ln1w, ln1b, wq, bq, wkv, bkv, wo, bo, ln2w, ln2b,
         g0w1, g0b1, g1w1, g1b1, l1w1, l1b1, l2w1, l2b1,
         g0w2, g0b2, g1w2, g1b2, l1w2, l1b2, l2w2, l2b2, rep) = ws
        d = fin
        hd = d // n_head
        scale = 1.0 / math.sqrt(hd)
        for i in range(b_tile):
            xi = x_ref[i]
            dt = xi.dtype
            xn = ln(xi, ln1w, ln1b)
            q = _dot(xn, wq, dt) + bq
            kv = _dot(xn, wkv, dt) + bkv
            k, v = kv[:, :hd], kv[:, hd:]
            heads = []
            for h in range(n_head):
                qh = q[:, h * hd:(h + 1) * hd]
                s = jax.lax.dot_general(
                    qh, k, dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32) * scale
                if sm_mode == "off":
                    p_h = (s * 0.01).astype(dt)
                elif sm_mode == "exp2":
                    s = s.astype(dt).astype(jnp.float32)
                    m = jnp.max(s, axis=-1, keepdims=True)
                    e = jnp.exp2((s - m) * 1.4426950408889634)
                    p_h = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(dt)
                else:
                    s = s.astype(dt).astype(jnp.float32)
                    m = jnp.max(s, axis=-1, keepdims=True)
                    e = jnp.exp(s - m)
                    p_h = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(dt)
                heads.append(jax.lax.dot_general(
                    p_h, v, dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32).astype(dt))
            o = jnp.concatenate(heads, axis=-1)
            y = _dot(o, wo, dt) + bo
            x1 = xi + y
            xn2 = ln(x1, ln2w, ln2b)
            h1 = _mk_moe(act, xn2, g0w1, g0b1, g1w1, g1b1, l1w1, l1b1,
                         l2w1, l2b1, rep, k=k_top, fin=fin, dt=dt)
            h1 = act(h1)
            ffn = _mk_moe(act, h1, g0w2, g0b2, g1w2, g1b2, l1w2, l1b2,
                          l2w2, l2b2, rep, k=k_top, fin=hidden, dt=dt)
            o_ref[i] = x1 + ffn

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
            vmem_limit_bytes=64 * 1024 * 1024),
    )
    return jax.jit(lambda x_, *ws_: f(x_, *ws_))


def main(batch=256, t_sel=160):
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

    variants = {
        "full": dict(gelu_mode="on", sm_mode="on", ln_mode="on"),
        "no_gelu": dict(gelu_mode="off", sm_mode="on", ln_mode="on"),
        "no_softmax": dict(gelu_mode="on", sm_mode="off", ln_mode="on"),
        "no_ln": dict(gelu_mode="on", sm_mode="on", ln_mode="off"),
        "dots_only": dict(gelu_mode="off", sm_mode="off", ln_mode="off"),
        "exp2": dict(gelu_mode="on", sm_mode="exp2", ln_mode="on"),
        "glu_sig": dict(gelu_mode="sig", sm_mode="on", ln_mode="on"),
    }
    out = {"batch": batch, "t_sel": t_sel, "b_tile": 4,
           "calib_before_tflops": round(quick_calib(), 1)}
    for name, modes in variants.items():
        kern = _make_kernel(n_head, k_top, d, hidden, 4, **modes)
        run = _runner(kern, 4, x, ws)

        def body(i, c, run=run):
            (xx,) = c
            return (xx * 0.9 + run(xx, *ws) * 0.1,)

        try:
            out[f"{name}_ms"] = round(device_loop_ms(body, (x,)), 4)
        except Exception as exc:
            out[f"{name}_ms"] = None
            out[f"{name}_err"] = str(exc)[-160:]
    out["calib_after_tflops"] = round(quick_calib(), 1)
    out["device_kind"] = getattr(jax.devices()[0], "device_kind", "?")
    print(json.dumps(out), flush=True)
    with open("PROBE_BLOCK_ABLATE.jsonl", "a") as f:
        f.write(json.dumps(out) + "\n")


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:]))
