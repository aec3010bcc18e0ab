"""On-chip probe: which formulation of cached cross-attention decode
reads the per-layer K/V at the highest effective bandwidth?

The decode-slope profile (PROFILE_DECODE_SLOPE.json, batch 256) attributes
~3.0 ms/step to the 12 cross-attention layers — an effective ~265 GB/s
over the 0.805 GB K/V read, 1/3 of v5e HBM peak.  This probe slope-times
a 12-layer chain of JUST the cross-attention decode op (q chained through
the output so steps serialize) for competing formulations:

* ``einsum``  — the shipping MultiheadAttention path (split-head einsums)
* ``flash``   — the Pallas flash kernel with q_len 1 padded to one 16-row
                bf16 tile (block_q 16), K/V read once, softmax fused
* ``vpu``     — broadcast-multiply + lane reduction (no MXU): scores and
                the weighted V sum as pure VPU ops
* ``fused1``  — scores/softmax/PV in ONE einsum chain on merged (h k) axes

Methodology identical to tools/decode_slope.py (slope between two
iteration counts cancels dispatch; min over attempts).

Usage: python tools/cross_decode_probe.py [batch]
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np

import jax

sys.path.insert(0, ".")

from image2text_tpu.utils.compile_cache import setup_compile_cache

setup_compile_cache("jaxcache-decode")
import jax.numpy as jnp

from image2text_tpu.ops.flash_attention import flash_attention

LO, HI = 4, 40
LAYERS = 12
H, S, D = 8, 64, 128
V5E_HBM_GBS = 819.0


def fenced_s(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    return time.perf_counter() - t0


def slope_ms(fn_lo, fn_hi, args, attempts=4):
    # min(hi) − min(lo): each min converges to true device time; the
    # min-of-differences estimator is biased low (see decode_slope.py)
    lo = min(fenced_s(fn_lo, *args) for _ in range(attempts))
    hi = min(fenced_s(fn_hi, *args) for _ in range(attempts))
    return (hi - lo) / (HI - LO) * 1e3 if hi > lo else -1.0


def main(batch: int):
    from bench_kernels import quick_calib

    rng = np.random.default_rng(0)
    ks = jnp.asarray(rng.standard_normal((LAYERS, batch, H, S, D)),
                     jnp.bfloat16)
    vs = jnp.asarray(rng.standard_normal((LAYERS, batch, H, S, D)),
                     jnp.bfloat16)
    q0 = jnp.asarray(rng.standard_normal((batch, H, 1, D)), jnp.bfloat16)
    scale = 1.0 / np.sqrt(D)

    def attn_einsum(q, k, v):
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                       preferred_element_type=jnp.float32) * scale
        p = jax.nn.softmax(s, axis=-1).astype(q.dtype)
        return jnp.einsum("bhqk,bhkd->bhqd", p, v,
                          preferred_element_type=jnp.float32).astype(q.dtype)

    def attn_flash(q, k, v):
        return flash_attention(q, k, v, block_q=16, block_k=S)

    def attn_vpu(q, k, v):
        # q (b,h,1,d) * k (b,h,s,d) → reduce d on the VPU lane axis
        s = jnp.sum(q.astype(jnp.float32) * k.astype(jnp.float32),
                    axis=-1)[:, :, None, :] * scale        # (b,h,1,s)
        p = jax.nn.softmax(s, axis=-1)                     # (b,h,1,s)
        return jnp.sum(p[:, :, 0][..., None] * v.astype(jnp.float32),
                       axis=-2)[:, :, None, :].astype(q.dtype)

    def attn_fused1(q, k, v):
        # single dot over the merged (h·s) axis via dot_general batching
        s = jax.lax.dot_general(
            q[:, :, 0], k, (((2,), (3,)), ((0, 1), (0, 1))),
            preferred_element_type=jnp.float32) * scale    # (b,h,s)
        p = jax.nn.softmax(s, axis=-1).astype(q.dtype)
        return jax.lax.dot_general(
            p, v, (((2,), (2,)), ((0, 1), (0, 1))),
            preferred_element_type=jnp.float32)[:, :, None].astype(q.dtype)

    # the real shipping path: q/out projections + split-head einsums
    from image2text_tpu.nn.modules import (MultiheadAttention, QuantizedKV,
                                           quantize_rows_int8)

    mha = MultiheadAttention(H * D, H)
    mp = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16),
        mha.init(jax.random.PRNGKey(1)))

    def attn_module(q, k, v):
        y = mha(mp, q[:, :, 0].reshape(batch, 1, H * D), None, None,
                precomputed_kv=(k, v))
        return y.reshape(batch, 1, H, D).swapaxes(1, 2)

    # ---- int8 serving-mode variants (round-5: attribute the end-to-end
    # regression of cross_kv_quant='int8' — BENCH_QUEUE_r04 2,209 vs 2,281)
    kq8, ks8 = quantize_rows_int8(ks)        # (L,b,h,s) scales f32
    vq8, vs8 = quantize_rows_int8(vs)

    def attn_int8_module(q, kv8):
        y = mha(mp, q[:, :, 0].reshape(batch, 1, H * D), None, None,
                precomputed_kv=QuantizedKV(*kv8))
        return y.reshape(batch, 1, H, D).swapaxes(1, 2)

    def attn_int8_raw(q, kv8):
        # shipping math minus the module's q/out projections
        kq, ksc, vq, vsc = kv8
        qq, qs = quantize_rows_int8(q)
        s = jnp.einsum("bhqd,bhkd->bhqk", qq, kq,
                       preferred_element_type=jnp.int32)
        s = s.astype(jnp.float32) * (qs[..., :, None] * ksc[..., None, :]) \
            * scale
        p = jax.nn.softmax(s, axis=-1)
        pq, ps = quantize_rows_int8(p * vsc[..., None, :])
        return ((jnp.einsum("bhqk,bhkd->bhqd", pq, vq,
                            preferred_element_type=jnp.int32)
                 .astype(jnp.float32) * ps[..., None])
                .astype(q.dtype))

    def attn_int8_dequant(q, kv8):
        # read int8 from HBM, dequantise INTO the bf16 dot (XLA fuses the
        # convert into the operand read) — no int8 MXU mode involved
        kq, ksc, vq, vsc = kv8
        k = kq.astype(jnp.bfloat16) * ksc[..., None].astype(jnp.bfloat16)
        v = vq.astype(jnp.bfloat16) * vsc[..., None].astype(jnp.bfloat16)
        return attn_einsum(q, k, v)

    def attn_int8_bf16q(q, kv8):
        # bf16 q against int8 k (mixed dot; XLA converts k in-register)
        kq, ksc, vq, vsc = kv8
        s = jnp.einsum("bhqd,bhkd->bhqk", q, kq.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)
        s = s * ksc[..., None, :] * scale
        p = jax.nn.softmax(s, axis=-1).astype(q.dtype)
        y = jnp.einsum("bhqk,bhkd->bhqd", (p * vsc[..., None, :]).astype(
            jnp.bfloat16), vq.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32)
        return y.astype(q.dtype)

    variants = {"einsum": attn_einsum, "flash": attn_flash,
                "vpu": attn_vpu, "fused1": attn_fused1,
                "module": attn_module}
    int8_variants = {"int8_module": attn_int8_module,
                     "int8_raw": attn_int8_raw,
                     "int8_dequant": attn_int8_dequant,
                     "int8_bf16q": attn_int8_bf16q}

    def chain(fn, n):
        def run(q, ks, vs):
            def body(i, q):
                def layer(l, q):
                    o = fn(q, ks[l], vs[l])
                    # feed output back as next query (serialises reads)
                    return (q + o).astype(q.dtype)
                return jax.lax.fori_loop(0, LAYERS, layer, q)
            return jax.lax.fori_loop(0, n, body, q)
        return jax.jit(run)

    gb_per_step = 2 * LAYERS * batch * H * S * D * 2 / 1e9
    floor_ms = gb_per_step / V5E_HBM_GBS * 1e3
    out = {"batch": batch, "kv_gb_per_step": round(gb_per_step, 3),
           "hbm_floor_ms": round(floor_ms, 3),
           "calib_before_tflops": round(quick_calib(), 1)}
    # methodology check: a pure streaming reduction over the K buffers —
    # if this reads above the HBM spec the timing itself is wrong
    def stream(n):
        def run(q, ks, vs):
            def body(i, q):
                # scale by a q-dependent scalar so neither hoisting nor
                # constant-folding can skip the per-iteration read
                a = q[0, 0, 0, 0].astype(jnp.float32)
                s = jnp.sum(ks.astype(jnp.float32) * a) + \
                    jnp.sum(vs.astype(jnp.float32) * a)
                return q + (s * 1e-30).astype(q.dtype)
            return jax.lax.fori_loop(0, n, body, q)
        return jax.jit(run)

    def chain8(fn, n):
        def run(q, kq8, ks8, vq8, vs8):
            def body(i, q):
                def layer(l, q):
                    o = fn(q, (kq8[l], ks8[l], vq8[l], vs8[l]))
                    return (q + o).astype(q.dtype)
                return jax.lax.fori_loop(0, LAYERS, layer, q)
            return jax.lax.fori_loop(0, n, body, q)
        return jax.jit(run)

    # int8 bandwidth ceiling: stream the int8 buffers + scales
    gb8 = (2 * LAYERS * batch * H * S * D * 1
           + 2 * LAYERS * batch * H * S * 4) / 1e9
    out["kv8_gb_per_step"] = round(gb8, 3)
    out["hbm8_floor_ms"] = round(gb8 / V5E_HBM_GBS * 1e3, 3)

    def stream8(n):
        def run(q, kq8, ks8, vq8, vs8):
            def body(i, q):
                a = q[0, 0, 0, 0].astype(jnp.float32)
                s = jnp.sum(kq8.astype(jnp.float32) * a) + \
                    jnp.sum(vq8.astype(jnp.float32) * a) + \
                    jnp.sum(ks8 * a) + jnp.sum(vs8 * a)
                return q + (s * 1e-30).astype(q.dtype)
            return jax.lax.fori_loop(0, n, body, q)
        return jax.jit(run)

    progs = {name: (chain(fn, LO), chain(fn, HI))
             for name, fn in variants.items()}
    progs["stream"] = (stream(LO), stream(HI))
    progs8 = {name: (chain8(fn, LO), chain8(fn, HI))
              for name, fn in int8_variants.items()}
    progs8["int8_stream"] = (stream8(LO), stream8(HI))
    args8 = (q0, kq8, ks8, vq8, vs8)
    for name, (flo, fhi) in progs.items():
        jax.block_until_ready(flo(q0, ks, vs))
        jax.block_until_ready(fhi(q0, ks, vs))
    for name, (flo, fhi) in progs8.items():
        jax.block_until_ready(flo(*args8))
        jax.block_until_ready(fhi(*args8))
    for name, (flo, fhi) in progs.items():
        ms = slope_ms(flo, fhi, (q0, ks, vs))
        out[f"{name}_ms"] = round(ms, 3)
        out[f"{name}_gbs"] = round(gb_per_step / ms * 1e3, 1) if ms > 0 else None
    for name, (flo, fhi) in progs8.items():
        ms = slope_ms(flo, fhi, args8)
        out[f"{name}_ms"] = round(ms, 3)
        out[f"{name}_gbs"] = round(gb8 / ms * 1e3, 1) if ms > 0 else None
    out["calib_after_tflops"] = round(quick_calib(), 1)
    out["device_kind"] = getattr(jax.devices()[0], "device_kind", "?")
    print(json.dumps(out))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 256)
