"""On-chip decomposition of the flagship cached decoder step.

Slope-times (same methodology as tools/decode_slope.py, min(hi)-min(lo))
four variants of the single-token cached decoder step at flagship dims:

* ``full``       — sparse decoder, bf16 cross-KV (the shipping step)
* ``nox``        — sparse decoder, cross-attention off
* ``dense``      — is_sparse_attn=False decoder, cross on
* ``dense_nox``  — dense decoder, cross off

full − nox       isolates the cross-attention cost (compare against
                 tools/cross_decode_probe.py's module row ≈ stream BW);
nox − dense_nox  isolates the sparse cached-decode machinery.

Usage: python tools/decoder_step_probe.py [batch]
"""
from __future__ import annotations

import copy
import json
import sys
import time

import numpy as np

import jax

sys.path.insert(0, ".")

from image2text_tpu.utils.compile_cache import setup_compile_cache

setup_compile_cache("jaxcache-decode")
import jax.numpy as jnp

# Long loops with CLAMPED positions: cache writes and pos-emb gathers clip
# at their buffer bounds past step ~160, so per-step shapes and HBM traffic
# stay exactly decode-realistic while the loop count — and therefore the
# slope signal vs the tunnel's seconds-scale dispatch noise — grows
# unbounded.  Numerics past the clamp are garbage; this is a TIMING probe.
LO, HI = 64, 2048
V5E_HBM_GBS = 819.0


def fenced_s(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    return time.perf_counter() - t0


def slope_ms(fn_lo, fn_hi, args, attempts=4):
    lo = min(fenced_s(fn_lo, *args) for _ in range(attempts))
    hi = min(fenced_s(fn_hi, *args) for _ in range(attempts))
    return (hi - lo) / (HI - LO) * 1e3 if hi > lo else -1.0


def main(batch: int):
    from bench_kernels import quick_calib

    from __graft_entry__ import _flagship_config
    from image2text_tpu.models.generation import (EVAL, decoder_step,
                                                  precompute_cross_kv)
    from image2text_tpu.models.vision_encoder_decoder import (
        VisionEncoderDecoder)

    cfg = _flagship_config(tiny=False)
    cfg_dense = copy.deepcopy(cfg)
    cfg_dense.model.decoder_config.transformer_config.is_sparse_attn = False

    rng = np.random.default_rng(0)
    out = {"batch": batch, "calib_before_tflops": round(quick_calib(), 1)}
    total = 161   # fixed cache length; long-loop writes clamp at the end
    prompt = jnp.ones((batch, 1), jnp.int32)

    variants = {}
    for name, c in (("sparse", cfg), ("dense", cfg_dense)):
        model = VisionEncoderDecoder(c.model)
        params = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if jnp.issubdtype(x.dtype, jnp.floating) else x,
            model.init(jax.random.PRNGKey(0)))
        n_cls = c.model.vision_encoder_config.n_cls
        d = c.model.decoder_config.transformer_config.attn_config.n_embd
        enc_out = jnp.asarray(rng.standard_normal((batch, n_cls, d)),
                              jnp.bfloat16)
        off = model.space_for_prompt

        def make(model=model, off=off, use_cross=True):
            def fn(p, enc_out, n):
                cross = enc_out if use_cross else None
                cache = model.decoder.init_cache(batch, total, enc_out.dtype)
                logits, cache = decoder_step(model, p, prompt, cache, off,
                                             cross)
                cross_kv = precompute_cross_kv(model, p, cross)

                def body(i, carry):
                    cache, last = carry
                    nxt = jnp.argmax(last, axis=-1).astype(jnp.int32)[:, None]
                    logits, cache = decoder_step(model, p, nxt, cache,
                                                 off + 1 + i, cross,
                                                 cross_kv=cross_kv)
                    return cache, logits[:, -1]

                _, last = jax.lax.fori_loop(0, n, body, (cache, logits[:, -1]))
                return last

            return (jax.jit(lambda p, e: fn(p, e, LO)),
                    jax.jit(lambda p, e: fn(p, e, HI)), (params, enc_out))

        key = "full" if name == "sparse" else "dense"
        variants[key] = make(use_cross=True)
        variants["nox" if name == "sparse" else "dense_nox"] = \
            make(use_cross=False)

    for lo, hi, args in variants.values():
        jax.block_until_ready(lo(*args))
        jax.block_until_ready(hi(*args))
    for vname, (lo, hi, args) in variants.items():
        los = [fenced_s(lo, *args) for _ in range(4)]
        his = [fenced_s(hi, *args) for _ in range(4)]
        print(f"{vname}: lo={['%.3f' % t for t in los]} "
              f"hi={['%.3f' % t for t in his]}", flush=True)
        m = (min(his) - min(los)) / (HI - LO) * 1e3
        out[f"{vname}_ms"] = round(m, 3)
    out["calib_after_tflops"] = round(quick_calib(), 1)
    out["device_kind"] = getattr(jax.devices()[0], "device_kind", "?")
    print(json.dumps(out))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 256)
