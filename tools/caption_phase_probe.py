"""Slope-based attribution of the NON-decode serving phases on the chip.

bench.py's per-batch caption latency (BENCH_QUEUE_r03b: 226 ms at batch
256) decomposes as decode loop (PROFILE_DECODE_SLOPE: ~3.7 ms/step x 32
= ~117 ms) plus an unattributed remainder spent in on-device
preprocessing, the encoder forward, and cached prefill.  This tool
slope-times each of those phases the same way tools/decode_slope.py
times decode variants: an entire compiled ``fori_loop`` at two trip
counts, min-over-attempts per endpoint, so tunnel dispatch cancels.

Phases (all at the flagship serving config, bf16 params):

* ``preproc`` — resize_normalize_on_device on the uint8 batch
* ``encoder`` — full ViT-MoE-sparse encoder forward
* ``prefill`` — fresh-cache decoder_step on the 1-token prompt plus
  per-layer cross-K/V precompute (the once-per-caption decoder cost)

Each phase chains a data dependency through the carry so XLA cannot
hoist the body out of the loop.  Appends one JSON line to
PROFILE_PHASES.json.

Usage: python tools/caption_phase_probe.py [batch]
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

import jax

sys.path.insert(0, ".")

from image2text_tpu.utils.compile_cache import setup_compile_cache

setup_compile_cache("jaxcache-decode")
import jax.numpy as jnp

LO, HI = 2, 14


def fenced_s(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    return time.perf_counter() - t0


def slope_ms(fn_lo, fn_hi, args, attempts=3):
    lo = min(fenced_s(fn_lo, *args) for _ in range(attempts))
    hi = min(fenced_s(fn_hi, *args) for _ in range(attempts))
    if hi <= lo:
        return -1.0
    return (hi - lo) / (HI - LO) * 1e3


def main(batch: int):
    from bench_kernels import quick_calib

    from __graft_entry__ import _flagship_config
    from image2text_tpu.models.generation import (EVAL, decoder_step,
                                                  precompute_cross_kv)
    from image2text_tpu.models.vision_encoder_decoder import VisionEncoderDecoder
    from image2text_tpu.ops.preprocess import resize_normalize_on_device

    cfg = _flagship_config(tiny=False)
    model = VisionEncoderDecoder(cfg.model)
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if jnp.issubdtype(x.dtype, jnp.floating) else x,
        model.init(jax.random.PRNGKey(0)))

    rng = np.random.default_rng(0)
    raw = jnp.asarray(rng.integers(0, 256, (batch, 160, 240, 3)), jnp.uint8)
    prompt = jnp.ones((batch, 1), jnp.int32)
    im_size = cfg.model.vision_encoder_config.input.width
    images = jax.jit(lambda r: resize_normalize_on_device(
        r, im_size, out_dtype=jnp.bfloat16))(raw)
    off = model.space_for_prompt
    total = 1 + 32

    def preproc_loop(n):
        def fn(raw):
            def body(i, carry):
                raw, acc = carry
                im = resize_normalize_on_device(raw, im_size,
                                                out_dtype=jnp.bfloat16)
                acc = im.mean()
                # fold the result back into the uint8 input so each
                # iteration depends on the previous one
                raw = raw + (acc > 1e9).astype(raw.dtype)
                return raw, acc
            _, acc = jax.lax.fori_loop(
                0, n, body, (raw, jnp.zeros((), jnp.bfloat16)))
            return acc
        return jax.jit(fn)

    def enc_loop(n):
        def fn(p, images):
            def body(i, carry):
                images, acc = carry
                out = model.encoder(p["encoder"], images, ctx=EVAL)
                acc = out.mean().astype(images.dtype)
                return images + acc * jnp.asarray(1e-8, images.dtype), acc
            _, acc = jax.lax.fori_loop(
                0, n, body, (images, jnp.zeros((), images.dtype)))
            return acc
        return jax.jit(fn)

    enc_out = jax.jit(lambda p, im: model.encoder(p["encoder"], im,
                                                  ctx=EVAL))(params, images)
    cross = enc_out if model.use_cross_attn else None

    def prefill_loop(n):
        def fn(p, enc_out):
            def body(i, carry):
                enc_out, acc = carry
                cache = model.decoder.init_cache(batch, total, enc_out.dtype)
                logits, cache = decoder_step(model, p, prompt, cache, off,
                                             enc_out)
                cross_kv = precompute_cross_kv(model, p, enc_out)
                acc = logits[:, -1].mean().astype(enc_out.dtype)
                if cross_kv is not None:
                    acc = acc + jax.tree_util.tree_leaves(cross_kv)[0].ravel()[0].astype(enc_out.dtype)
                return enc_out + acc * jnp.asarray(1e-8, enc_out.dtype), acc
            _, acc = jax.lax.fori_loop(
                0, n, body, (enc_out, jnp.zeros((), enc_out.dtype)))
            return acc
        return jax.jit(fn)

    variants = {
        "preproc": (preproc_loop(LO), preproc_loop(HI), (raw,)),
        "encoder": (enc_loop(LO), enc_loop(HI), (params, images)),
    }
    if cross is not None:
        variants["prefill"] = (prefill_loop(LO), prefill_loop(HI),
                               (params, enc_out))

    for lo, hi, args in variants.values():
        jax.block_until_ready(lo(*args))
        jax.block_until_ready(hi(*args))

    deadline = time.time() + float(os.environ.get("PHASE_PROBE_WAIT_MIN",
                                                  "30")) * 60
    best = None
    attempt = 0
    while True:
        attempt += 1
        c0 = quick_calib()
        out = {"batch": batch, "calib_before_tflops": round(c0, 1)}
        if c0 > 100:
            for name, (lo, hi, args) in variants.items():
                out[f"{name}_ms"] = round(slope_ms(lo, hi, args), 3)
            c1 = quick_calib()
            out["calib_after_tflops"] = round(c1, 1)
            measured = all(out[f"{n}_ms"] > 0 for n in variants)
            out["healthy"] = c0 > 100 and c1 > 100 and measured
            if measured and (best is None
                             or (out["healthy"] and not best.get("healthy"))
                             or (out["healthy"] == best.get("healthy")
                                 and out["encoder_ms"]
                                 < best.get("encoder_ms", 1e9))):
                best = out
            print(f"attempt {attempt}: calib {c0:.0f}->{c1:.0f} "
                  f"{ {k: v for k, v in out.items() if k.endswith('_ms')} } "
                  f"healthy={out['healthy']}", flush=True)
            if out["healthy"]:
                break
        else:
            print(f"attempt {attempt}: calib {c0:.0f} — degraded, waiting",
                  flush=True)
        if time.time() > deadline:
            break
        time.sleep(30)
    out = best or out
    out.setdefault("calib_after_tflops", None)
    out.setdefault("healthy", False)
    for name in variants:
        out.setdefault(f"{name}_ms", None)
    out["device_kind"] = getattr(jax.devices()[0], "device_kind", "?")
    print(json.dumps(out))
    with open("PROFILE_PHASES.json", "a") as f:
        f.write(json.dumps(out) + "\n")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 256)
