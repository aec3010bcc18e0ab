"""Kernel microbenchmarks on the real chip (VERDICT round-1 item 6).

Produces ONE JSON object (pretty-printed to stdout and written to
``BENCH_KERNELS.json``) with two tables:

* **attention**: Pallas flash (ops/flash_attention.py) vs XLA fused
  attention (ops/attention._xla-style einsum path), forward and
  forward+backward, seq ∈ {320, 1024, 2048, 4096}, causal MQA bf16 at the
  flagship head layout (h=8, d=128) — the measured table the
  ``flash_attention_compatible`` dispatch thresholds cite;
* **int4_matmul**: Pallas fused dequant-matmul (ops/int4_matmul.py) vs the
  XLA dequantize+dot fallback vs a plain bf16 matmul, at HF-decoder
  projection shapes.

Timing is fenced the same way as bench.py: each window chains a data
dependency through every iteration and closes on a device→host copy.
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


def timed_ms(fn, chain, *args, iters=20, windows=3):
    """Median fenced window; ``chain(out, args) -> args`` threads a data
    dependency through successive calls."""
    out = fn(*args)
    jax.block_until_ready(out)  # warm/compile
    dts = []
    for w in range(windows):
        a = args
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*a)
            a = chain(out, a)
        np.asarray(jax.tree_util.tree_leaves(out)[0])  # D2H fence
        dts.append((time.perf_counter() - t0) / iters * 1000.0)
    return sorted(dts)[len(dts) // 2]


def bench_attention():
    B, H, D = 8, 8, 128  # flagship MQA layout (kv heads = 1)
    rows = []
    for s in (320, 1024, 2048, 4096):
        k0 = jax.random.PRNGKey(0)
        q = jax.random.normal(k0, (B, H, s, D), jnp.bfloat16)
        k = jax.random.normal(k0, (B, 1, s, D), jnp.bfloat16)
        v = jax.random.normal(k0, (B, 1, s, D), jnp.bfloat16)

        def chain(out, args):
            qq = args[0] + (out * 0).astype(args[0].dtype)
            return (qq, *args[1:])

        flash_f = jax.jit(lambda q, k, v: flash_sdpa(q, k, v, None, True))
        xla_f = jax.jit(lambda q, k, v: _xla_attention(
            q, k, v, _causal_bias(q.shape[-2], k.shape[-2])))

        def mk_grad(f):
            def loss(q, k, v):
                return jnp.sum(f(q, k, v).astype(jnp.float32))
            g = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))

            def chain_g(out, args):
                qq = args[0] + (out[0] * 0).astype(args[0].dtype)
                return (qq, *args[1:])

            return g, chain_g

        fwd_flash = timed_ms(flash_f, chain, q, k, v)
        fwd_xla = timed_ms(xla_f, chain, q, k, v)
        gf, cg = mk_grad(lambda q, k, v: flash_sdpa(q, k, v, None, True))
        gx, _ = mk_grad(lambda q, k, v: _xla_attention(
            q, k, v, _causal_bias(q.shape[-2], k.shape[-2])))
        bwd_flash = timed_ms(gf, cg, q, k, v, iters=10)
        bwd_xla = timed_ms(gx, cg, q, k, v, iters=10)
        rows.append({
            "seq": s, "batch": B, "heads": H, "head_dim": D,
            "fwd_xla_ms": round(fwd_xla, 3),
            "fwd_flash_ms": round(fwd_flash, 3),
            "fwd_speedup": round(fwd_xla / fwd_flash, 2),
            "fwdbwd_xla_ms": round(bwd_xla, 3),
            "fwdbwd_flash_ms": round(bwd_flash, 3),
            "fwdbwd_speedup": round(bwd_xla / bwd_flash, 2),
        })
        print(f"attention s={s}: fwd xla {fwd_xla:.3f} ms / flash "
              f"{fwd_flash:.3f} ms ({fwd_xla / fwd_flash:.2f}x); fwd+bwd "
              f"xla {bwd_xla:.3f} / flash {bwd_flash:.3f} "
              f"({bwd_xla / bwd_flash:.2f}x)", flush=True)
    return rows


def _causal_bias(sq, skv):
    i = jnp.arange(sq)[:, None]
    j = jnp.arange(skv)[None, :]
    return jnp.where(j <= i + (skv - sq), 0.0, -jnp.inf)[None, None]


def bench_int4():
    from image2text_tpu.ops.int4_matmul import (
        dequantize_int4,
        int4_matmul,
        quantize_pack_int4,
    )

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

        def chain(out, args):
            # scalar-reduce the output so the dependency survives ANY
            # out/in shape combination — a dropped dependency would let
            # windows close on dispatch (the round-1 artifact)
            xx = args[0] + (out.sum() * 0).astype(args[0].dtype)
            return (xx, *args[1:])

        fused = jax.jit(lambda x, p, s: int4_matmul(x, p, s))
        xla_deq = jax.jit(
            lambda x, p, s: x @ dequantize_int4(p, s).astype(x.dtype).T)
        plain = jax.jit(lambda x, w: x @ w.T)

        t_fused = timed_ms(fused, chain, x, packed, scales)
        t_deq = timed_ms(xla_deq, chain, x, packed, scales)
        t_bf16 = timed_ms(plain, chain, x, wb)
        rows.append({
            "tokens": n, "in": fin, "out": fout,
            "pallas_fused_ms": round(t_fused, 4),
            "xla_dequant_dot_ms": round(t_deq, 4),
            "bf16_dot_ms": round(t_bf16, 4),
            "fused_vs_xla_dequant": round(t_deq / t_fused, 2),
            "fused_vs_bf16": round(t_bf16 / t_fused, 2),
        })
        print(f"int4 ({n}x{fin}->{fout}): fused {t_fused:.4f} ms, "
              f"xla dequant+dot {t_deq:.4f} ms, bf16 {t_bf16:.4f} ms",
              flush=True)
    return rows


def calibration_tflops() -> float:
    """Sustained bf16 TFLOP/s on a plain 4096^3 matmul in this harness.

    Validity gate for every number in this file: a healthy v5e sustains
    >100 TFLOP/s here; a reading far below means the chip/tunnel is
    degraded and the table must not be used for dispatch decisions."""
    n = 4096
    a = jax.random.normal(jax.random.PRNGKey(0), (n, n), jnp.bfloat16)
    f = jax.jit(lambda a: a @ a)

    def chain(out, args):
        return (args[0] + (out[:1, :1] * 0).astype(args[0].dtype),)

    ms = timed_ms(f, chain, a, iters=20)
    return 2 * n ** 3 / ms / 1e9


def main():
    dev = jax.devices()[0]
    calib = calibration_tflops()
    print(f"calibration: {calib:.1f} TFLOP/s sustained on 4096^3 bf16 "
          f"matmul", flush=True)
    result = {
        "device_kind": getattr(dev, "device_kind", "?"),
        "platform": str(dev.platform),
        "dtype": "bfloat16",
        "timing": "median-of-3 fenced windows "
                  "(D2H-materialized, data-dependency chained)",
        "calibration_matmul_tflops": round(calib, 1),
        "calibration_note": "healthy v5e sustains >100 here; far lower "
                            "means the chip/tunnel was degraded during "
                            "this run and the table is NOT decision-grade",
        "attention": bench_attention(),
        "int4_matmul": bench_int4(),
    }
    with open("BENCH_KERNELS.json", "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
