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
    from image2text_tpu.nn.modules import MultiheadAttention

    mha = MultiheadAttention(H * D, H)
    mp = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16),
        mha.init(jax.random.PRNGKey(1)))

    def attn_module(q, k, v):
        y = mha(mp, q[:, :, 0].reshape(batch, 1, H * D), None, None,
                precomputed_kv=(k, v))
        return y.reshape(batch, 1, H, D).swapaxes(1, 2)

    variants = {"einsum": attn_einsum, "flash": attn_flash,
                "vpu": attn_vpu, "fused1": attn_fused1,
                "module": attn_module}

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

    progs = {name: (chain(fn, LO), chain(fn, HI))
             for name, fn in variants.items()}
    progs["stream"] = (stream(LO), stream(HI))
    for name, (flo, fhi) in progs.items():
        jax.block_until_ready(flo(q0, ks, vs))
        jax.block_until_ready(fhi(q0, ks, vs))
    for name, (flo, fhi) in progs.items():
        ms = slope_ms(flo, fhi, (q0, ks, vs))
        out[f"{name}_ms"] = round(ms, 3)
        out[f"{name}_gbs"] = round(gb_per_step / ms * 1e3, 1) if ms > 0 else None
    out["calib_after_tflops"] = round(quick_calib(), 1)
    out["device_kind"] = getattr(jax.devices()[0], "device_kind", "?")
    print(json.dumps(out))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 256)
