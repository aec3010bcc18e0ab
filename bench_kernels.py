"""Kernel microbenchmarks on the real chip (VERDICT round-1 item 6).

Produces ONE JSON object (pretty-printed to stdout and written to
``BENCH_KERNELS.json``) with two tables:

* **attention**: Pallas flash (ops/flash_attention.py) vs XLA fused
  attention, forward and forward+backward, seq ∈ {320, 1024, 2048, 4096},
  causal MQA bf16 at the flagship head layout (h=8, d=128) — the measured
  table the ``flash_attention_compatible`` dispatch thresholds cite;
* **int4_matmul**: Pallas fused dequant-matmul (ops/int4_matmul.py) vs the
  XLA dequantize+dot fallback vs a plain bf16 matmul, at HF-decoder
  projection shapes.

Timing methodology — the axon tunnel adds LARGE, VARIABLE per-dispatch RPC
latency (observed 25–800 ms), so per-call wall clocks are meaningless.
Each measurement instead runs the op inside an ON-DEVICE ``lax.fori_loop``
(iteration i+1's input depends on iteration i's output through
``x + eps*out``, so nothing is loop-invariant-hoisted) at two iteration
counts; the SLOPE is pure device time per op, with dispatch/fence overhead
cancelled.  A plain-matmul calibration using the same method validates the
chip (healthy v5e: ~200 TFLOP/s).
"""
from __future__ import annotations

import json
import time

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

from image2text_tpu.ops.flash_attention import _xla_attention, flash_sdpa

EPS = 1e-6  # feedback factor: real data dependency, negligible drift


def _run_loop(body, carry0, iters, reps):
    f = jax.jit(lambda c, n=iters: jax.lax.fori_loop(0, n, body, c))
    out = f(carry0)
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = f(carry0)
        np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
        ts.append(time.perf_counter() - t0)
    # min: fenced time = device compute + tunnel jitter (>= one RPC); the
    # minimum approaches compute + the RPC floor, which the slope cancels
    return min(ts)


def device_loop_ms(body, carry0, target_s=2.0, reps=3) -> float:
    """Pure device ms per iteration of ``body``: run the op inside an
    on-device fori_loop at two iteration counts auto-scaled so the high
    window's COMPUTE dominates the tunnel's RPC jitter (observed up to
    ~1 s per dispatch), then take the slope."""
    probe = _run_loop(body, carry0, 8, 2)
    per = max(probe / 8, 1e-5)
    # quantize to a power of two: repeat runs then reuse the SAME compiled
    # fori_loop from the persistent cache — compile traffic through the
    # tunnel is itself a major source of measurement-window contamination
    hi = 16
    while hi < target_s / per and hi < 8192:
        hi *= 2
    lo = max(2, hi // 8)
    t_lo = _run_loop(body, carry0, lo, reps)
    t_hi = _run_loop(body, carry0, hi, reps)
    return max((t_hi - t_lo) / (hi - lo) * 1e3, 0.0)


def calibration_tflops() -> float:
    """Sustained bf16 TFLOP/s on a plain 4096^3 matmul (slope method).

    Validity gate: a healthy v5e sustains ~200 here; far lower means the
    DEVICE (not just the tunnel) is degraded and the tables must not be
    used for dispatch decisions."""
    n = 4096
    x = jax.random.normal(jax.random.PRNGKey(0), (n, n), jnp.bfloat16)

    # the operand rides the CARRY, not a closure: a closed-over device
    # array gets baked into the program as a constant, which forces a
    # 32 MB device->host read through the tunnel at trace time
    def body(i, c):
        a, x = c
        return ((a @ x) * 0.5 + x * 0.1, x)

    ms = device_loop_ms(body, (x, x))
    return 2 * n ** 3 / ms / 1e9 if ms > 0 else 0.0


def bench_attention():
    B, H, D = 8, 8, 128  # flagship MQA layout (kv heads = 1)
    rows = []
    for s in (320, 1024, 2048, 4096):
        k0 = jax.random.PRNGKey(0)
        q = jax.random.normal(k0, (B, H, s, D), jnp.bfloat16)
        k = jax.random.normal(k0, (B, 1, s, D), jnp.bfloat16)
        v = jax.random.normal(k0, (B, 1, s, D), jnp.bfloat16)
        bias = _causal_bias(s, s)

        def fwd_body(attn_fn):
            def body(i, qq):
                out = attn_fn(qq, k, v)
                return qq + EPS * out.astype(qq.dtype)
            return body

        def bwd_body(attn_fn):
            def loss(qq, kk, vv):
                return jnp.sum(attn_fn(qq, kk, vv).astype(jnp.float32))
            g = jax.grad(loss, argnums=0)

            def body(i, qq):
                return qq + EPS * g(qq, k, v).astype(qq.dtype)
            return body

        flash_fn = lambda qq, kk, vv: flash_sdpa(qq, kk, vv, None, True)
        xla_fn = lambda qq, kk, vv: _xla_attention(qq, kk, vv, bias)

        fwd_flash = device_loop_ms(fwd_body(flash_fn), q)
        fwd_xla = device_loop_ms(fwd_body(xla_fn), q)
        bwd_flash = device_loop_ms(bwd_body(flash_fn), q)
        bwd_xla = device_loop_ms(bwd_body(xla_fn), q)
        def ratio(a, b):
            return round(a / b, 2) if a > 0 and b > 0 else None

        rows.append({
            "seq": s, "batch": B, "heads": H, "head_dim": D,
            "fwd_xla_ms": round(fwd_xla, 3),
            "fwd_flash_ms": round(fwd_flash, 3),
            "fwd_speedup": ratio(fwd_xla, fwd_flash),
            "fwdbwd_xla_ms": round(bwd_xla, 3),
            "fwdbwd_flash_ms": round(bwd_flash, 3),
            "fwdbwd_speedup": ratio(bwd_xla, bwd_flash),
            "valid": all(t > 0 for t in
                         (fwd_xla, fwd_flash, bwd_xla, bwd_flash)),
        })
        print(f"attention s={s}: fwd xla {fwd_xla:.3f} ms / flash "
              f"{fwd_flash:.3f} ms; fwd+bwd xla {bwd_xla:.3f} / flash "
              f"{bwd_flash:.3f}", flush=True)
    return rows


def _causal_bias(sq, skv):
    i = jnp.arange(sq)[:, None]
    j = jnp.arange(skv)[None, :]
    return jnp.where(j <= i + (skv - sq), 0.0, -jnp.inf)[None, None]


def bench_int4():
    from image2text_tpu.ops import int4_matmul as int4_mod
    from image2text_tpu.ops.int4_matmul import (
        dequantize_int4,
        int4_matmul,
        quantize_pack_int4,
    )

    int4_mod.INT4_KERNEL = "pallas"  # the sweep measures the KERNEL vs XLA

    rows = []
    # (tokens, in, out): GPT-2-medium c_fc-ish, GPT-2-xl, Llama-7B qkv-ish
    for (n, fin, fout) in ((256, 1024, 4096), (256, 1600, 6400),
                           (512, 4096, 4096)):
        rng = np.random.default_rng(0)
        w = rng.standard_normal((fout, fin)).astype(np.float32)
        packed, scales = quantize_pack_int4(w)
        packed, scales = jnp.asarray(packed), jnp.asarray(scales)
        x = jax.random.normal(jax.random.PRNGKey(1), (n, fin), jnp.bfloat16)
        wb = jnp.asarray(w, jnp.bfloat16)

        def body_of(mm):
            def body(i, xx):
                out = mm(xx)
                # scalar feedback: survives any out/in shape combination
                return xx + (EPS * out.sum()).astype(xx.dtype)
            return body

        t_fused = device_loop_ms(
            body_of(lambda xx: int4_matmul(xx, packed, scales)), x)
        t_deq = device_loop_ms(
            body_of(lambda xx: xx @ dequantize_int4(packed, scales)
                    .astype(xx.dtype).T), x)
        t_bf16 = device_loop_ms(body_of(lambda xx: xx @ wb.T), x)
        def ratio(a, b):
            return round(a / b, 2) if a > 0 and b > 0 else None

        rows.append({
            "tokens": n, "in": fin, "out": fout,
            "pallas_fused_ms": round(t_fused, 4),
            "xla_dequant_dot_ms": round(t_deq, 4),
            "bf16_dot_ms": round(t_bf16, 4),
            "fused_vs_xla_dequant": ratio(t_deq, t_fused),
            "fused_vs_bf16": ratio(t_bf16, t_fused),
            "valid": all(t > 0 for t in (t_fused, t_deq, t_bf16)),
        })
        print(f"int4 ({n}x{fin}->{fout}): fused {t_fused:.4f} ms, "
              f"xla dequant+dot {t_deq:.4f} ms, bf16 {t_bf16:.4f} ms",
              flush=True)
    return rows


def _try(fn, fallback):
    try:
        return fn()
    except Exception as e:  # tunnel/backend failures must not lose the run
        print(f"SECTION FAILED: {type(e).__name__}: {str(e)[:200]}",
              flush=True)
        return fallback


def main():
    dev = jax.devices()[0]
    # best-of-3: tunnel jitter only ever INFLATES wall time, so the
    # highest calibration reading is the closest to true device capability
    calib = max(_try(calibration_tflops, 0.0) for _ in range(3))
    print(f"calibration: {calib:.1f} TFLOP/s sustained on 4096^3 bf16 "
          f"matmul (slope method)", flush=True)
    result = {
        "device_kind": getattr(dev, "device_kind", "?"),
        "platform": str(dev.platform),
        "dtype": "bfloat16",
        "timing": "on-device fori_loop, two-point iteration slope "
                  "(dispatch/tunnel overhead cancelled)",
        "calibration_matmul_tflops": round(calib, 1),
        "calibration_note": "healthy v5e sustains ~200 here; far lower "
                            "means tunnel jitter leaked into the slopes "
                            "during this run and the table is NOT "
                            "decision-grade",
        "decision_grade": calib > 100,
        "attention": _try(bench_attention, []),
        "int4_matmul": _try(bench_int4, []),
    }
    with open("BENCH_KERNELS.json", "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
