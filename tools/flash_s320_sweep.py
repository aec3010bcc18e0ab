"""Flash-vs-XLA at the flagship training shape, block-size sweep.

VERDICT r3 item 4: the flash kernels lose at s=320 (0.37x fwd,
BENCH_KERNELS.json) and the flagship train step sees flash_speedup 1.0.
This sweep asks whether TILE SIZES are the reason: at s=320 the default
(block_q 512, block_k 1024) clamps to a single (320, 384) tile per
(batch, head) — the online-softmax machinery runs once per program with
no tiling benefit, while XLA fuses the whole (320, 384) problem.  If no
(bq, bk) wins, the negative is decision-grade: the dispatch gate's
small-s routing to XLA stands on tuning evidence, not a single default.

Shape: b=48, h=8 (MQA kv-heads 1), s=320, d=128, causal — the flagship
train step's attention.  Slope-timed fori_loops, calibration brackets.
Appends one JSON line to FLASH_S320.json.

Usage: python tools/flash_s320_sweep.py
"""
from __future__ import annotations

import json
import sys

import jax

sys.path.insert(0, ".")

from image2text_tpu.utils.compile_cache import setup_compile_cache

setup_compile_cache("jaxcache-decode")
import jax.numpy as jnp

from bench_kernels import device_loop_ms, quick_calib
from image2text_tpu.ops.flash_attention import (_xla_attention,
                                                flash_attention, flash_sdpa)


def _causal_bias(sq, skv):
    i = jnp.arange(sq)[:, None]
    j = jnp.arange(skv)[None, :]
    return jnp.where(j <= i + (skv - sq), 0.0, -jnp.inf)[None, None]

EPS = 1e-3


def main():
    B, H, S, D = 48, 8, 320, 128
    k0 = jax.random.PRNGKey(0)
    q = jax.random.normal(k0, (B, H, S, D), jnp.bfloat16)
    k = jax.random.normal(k0, (B, 1, S, D), jnp.bfloat16)
    v = jax.random.normal(k0, (B, 1, S, D), jnp.bfloat16)
    bias = _causal_bias(S, S)

    def fwd_body(fn):
        def body(i, c):
            (qq,) = c
            return (qq + EPS * fn(qq).astype(qq.dtype),)
        return body

    def bwd_body(fn):
        def loss(qq):
            return jnp.sum(fn(qq).astype(jnp.float32))
        g = jax.grad(loss)

        def body(i, c):
            (qq,) = c
            return (qq + EPS * g(qq).astype(qq.dtype),)
        return body

    out = {"shape": f"b{B} h{H} s{S} d{D} causal MQA",
           "calib_before_tflops": round(quick_calib(), 1)}
    out["fwd_xla_ms"] = round(device_loop_ms(
        fwd_body(lambda qq: _xla_attention(qq, k, v, bias)), (q,)), 4)
    out["fwdbwd_xla_ms"] = round(device_loop_ms(
        bwd_body(lambda qq: _xla_attention(qq, k, v, bias)), (q,)), 4)
    # forward block sweep (flash_attention exposes block sizes; the
    # custom-vjp wrapper pins its own, so fwd+bwd is measured at the
    # default pair only)
    for bq, bk in ((512, 1024), (320, 128), (128, 384), (128, 128)):
        fn = lambda qq, bq=bq, bk=bk: flash_attention(
            qq, k, v, None, causal=True, block_q=bq, block_k=bk)
        out[f"fwd_flash_{bq}x{bk}_ms"] = round(
            device_loop_ms(fwd_body(fn), (q,)), 4)
    out["fwdbwd_flash_default_ms"] = round(device_loop_ms(
        bwd_body(lambda qq: flash_sdpa(qq, k, v, None, True)), (q,)), 4)
    out["calib_after_tflops"] = round(quick_calib(), 1)
    out["device_kind"] = getattr(jax.devices()[0], "device_kind", "?")
    print(json.dumps(out), flush=True)
    with open("FLASH_S320.json", "a") as f:
        f.write(json.dumps(out) + "\n")


if __name__ == "__main__":
    main()
