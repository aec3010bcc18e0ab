"""Decode-path component timing on the real chip.

Breaks one flagship `generate` call into separately-jitted sub-programs
and times each with the fenced-window methodology, so the serving cost is
attributable:

* preprocessing (uint8 -> bf16 resize+normalize)
* encoder forward
* cross-K/V precompute
* ONE cached decoder step (12 layers, single token)
* sampling step (ngram bias + top-k + categorical)
* whole generate (the compiled fori_loop) for cross-checking the sum

Starts with the calibration matmul (see bench_kernels.py) — if the chip
is degraded the report says so.  Prints one JSON object and appends to
PROFILE_DECODE.json.

Usage: python tools/profile_decode.py [batch]
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

sys.path.insert(0, ".")

MAX_NEW_TOKENS = 32


def fenced_ms(fn, *args, iters=10, windows=3, chain=None):
    out = fn(*args)
    jax.block_until_ready(out)
    dts = []
    for w in range(windows):
        a = args
        t0 = time.perf_counter()
        for i in range(iters):
            out = fn(*a)
            if chain is not None:
                a = chain(out, a)
        np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
        dts.append((time.perf_counter() - t0) / iters * 1000.0)
    return sorted(dts)[len(dts) // 2]


def main(batch: int):
    from bench_kernels import calibration_tflops

    from __graft_entry__ import _flagship_config
    from image2text_tpu.models.generation import (
        EVAL,
        decoder_step,
        precompute_cross_kv,
    )
    from image2text_tpu.models.kv_cache import KVCache
    from image2text_tpu.models.sampling import no_repeat_ngram_bias, sample_logits
    from image2text_tpu.models.vision_encoder_decoder import VisionEncoderDecoder
    from image2text_tpu.ops.preprocess import resize_normalize_on_device

    calib = calibration_tflops()
    print(f"calibration: {calib:.1f} TFLOP/s", flush=True)

    cfg = _flagship_config(tiny=False)
    model = VisionEncoderDecoder(cfg.model)
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if jnp.issubdtype(x.dtype, jnp.floating) else x,
        model.init(jax.random.PRNGKey(0)))

    rng = np.random.default_rng(0)
    raw = jnp.asarray(rng.integers(0, 256, (batch, 160, 240, 3)), jnp.uint8)
    prompt = jnp.ones((batch, 1), jnp.int32)

    pre = jax.jit(lambda r: resize_normalize_on_device(
        r, cfg.model.vision_encoder_config.input.width,
        out_dtype=jnp.bfloat16))
    images = pre(raw)
    t_pre = fenced_ms(pre, raw)

    enc = jax.jit(lambda p, im: jnp.sum(
        model.encoder(p["encoder"], im, ctx=EVAL).astype(jnp.float32)))
    t_enc = fenced_ms(enc, params, images)

    enc_out = jax.jit(lambda p, im: model.encoder(p["encoder"], im,
                                                  ctx=EVAL))(params, images)
    ckv_fn = jax.jit(lambda p, e: precompute_cross_kv(model, p, e))
    t_ckv = fenced_ms(ckv_fn, params, enc_out)
    cross_kv = ckv_fn(params, enc_out)

    off = model.space_for_prompt
    total = 1 + MAX_NEW_TOKENS
    cache = model.decoder.init_cache(batch, total, enc_out.dtype)
    _, cache = decoder_step(model, params, prompt, cache, off, enc_out)

    tok = jnp.full((batch, 1), 7, jnp.int32)

    # enc_out / cross_kv ride as ARGUMENTS: closure-captured device arrays
    # get baked into the program as constants, and at batch>=256 the baked
    # HLO exceeds the tunnel's /remote_compile HTTP body limit (HTTP 413)
    def one_step(p, tok, cache, enc_out, cross_kv):
        logits, cache2 = decoder_step(model, p, tok, cache, off + 5,
                                      enc_out, cross_kv=cross_kv)
        return logits[:, -1]

    step_j = jax.jit(one_step)
    t_step = fenced_ms(step_j, params, tok, cache, enc_out, cross_kv)

    ids_buf = jnp.zeros((batch, total), jnp.int32)
    last = jnp.zeros((batch, cfg.model.decoder_config.vocab_size),
                     jnp.float32)

    def samp(ids_buf, last, r):
        bias = no_repeat_ngram_bias(ids_buf, jnp.asarray(5),
                                    last.shape[-1], (2, 3, 4, 5))
        return sample_logits(last + bias, r, 0.7, 16)

    samp_j = jax.jit(samp)
    t_samp = fenced_ms(samp_j, ids_buf, last, jax.random.PRNGKey(0))

    gen = jax.jit(lambda p, im, pr, r: model.generate(
        p, im, pr, max_new_tokens=MAX_NEW_TOKENS, temperature=0.7,
        top_k=16, rng=r))
    t_gen = fenced_ms(gen, params, images, prompt, jax.random.PRNGKey(0),
                      iters=4)

    out = {
        "batch": batch,
        "calibration_tflops": round(calib, 1),
        "preprocess_ms": round(t_pre, 3),
        "encoder_ms": round(t_enc, 3),
        "cross_kv_ms": round(t_ckv, 3),
        "decoder_step_ms": round(t_step, 3),
        "sampling_step_ms": round(t_samp, 3),
        "generate_total_ms": round(t_gen, 2),
        "decode_steps": MAX_NEW_TOKENS,
        "sum_of_parts_ms": round(
            t_pre + t_enc + t_ckv
            + MAX_NEW_TOKENS * (t_step + t_samp), 2),
        "device_kind": getattr(jax.devices()[0], "device_kind", "?"),
    }
    print(json.dumps(out))
    with open("PROFILE_DECODE.json", "a") as f:
        f.write(json.dumps(out) + "\n")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 128)
