"""bf16-vs-f32 timing for the fused ngram-ban + top-k sampler.

Measures ``sampling.sample_topk_with_ngram`` (the serving decode loop's
per-step sampler, top_k 16, ngrams 2-5, id buffer 33) on logits in f32
vs bf16 — the dtype-preserving sampler rework keeps every full-vocab
pass in the logits' storage dtype.  Slope-timed on-device fori_loops,
calibration-bracketed.  Appends one JSON line to PROBE_SAMPLER.jsonl.

Usage: python tools/sampler_probe.py
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
from image2text_tpu.models.sampling import sample_topk_with_ngram

V = 50258
L = 33
NGRAMS = (2, 3, 4, 5)


def main():
    out = {"calib_before_tflops": round(quick_calib(), 1)}
    for b in (256, 1024):
        ids0 = jax.random.randint(jax.random.PRNGKey(0), (b, L), 1, V,
                                  jnp.int32)
        for dt, tag in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
            logits0 = jax.random.normal(jax.random.PRNGKey(1), (b, V), dt)

            def body(i, c):
                logits, ids = c
                nxt = sample_topk_with_ngram(
                    logits, ids, jnp.asarray(L - 1),
                    NGRAMS, jax.random.fold_in(jax.random.PRNGKey(2), i),
                    0.7, 16)
                ids = jax.lax.dynamic_update_slice(ids, nxt[:, None],
                                                   (0, L - 1))
                # column-0 perturbation: next iteration's logits depend on
                # this sample (no hoist) at negligible extra traffic
                logits = logits.at[:, 0].add(
                    (nxt % 3).astype(dt) * jnp.asarray(1e-3, dt))
                return logits, ids

            out[f"b{b}_{tag}_ms"] = round(
                device_loop_ms(body, (logits0, ids0)), 4)
    # ---- stage decomposition of gathered_top_k at the serving shape ----
    # (bf16, k=48, chunk 128): which term actually dominates the 4.6 ms
    # at batch 1024 — the full-vocab passes or the sort machinery?
    k, chunk = 48, 128
    for b in (256, 1024):
        logits = jax.random.normal(jax.random.PRNGKey(3), (b, V),
                                   jnp.bfloat16)
        c = -(-V // chunk)
        pad = c * chunk - V
        blocks0 = jnp.pad(logits, ((0, 0), (0, pad)),
                          constant_values=-jnp.inf).reshape(b, c, chunk)

        def chain(fn):
            """Stage body whose FULL output feeds the next iteration's
            input (sum over trailing dims — no DCE slicing, no hoist)."""
            def body(i, carry):
                (x,) = carry
                y = fn(x)
                # clamp: gathered rows can carry the -inf vocab padding,
                # which would poison the sum-chained carry
                y = jnp.maximum(y, jnp.asarray(-1e4, y.dtype))
                s = jnp.sum(y, axis=tuple(range(1, y.ndim)), keepdims=False)
                s = s.reshape(b, *([1] * (x.ndim - 1)))
                return (x + s.astype(x.dtype) * jnp.asarray(1e-6, x.dtype),)
            return body

        maxes0 = jnp.max(blocks0, axis=-1)
        _, bidx0 = jax.lax.top_k(maxes0, k)
        oh0 = jax.nn.one_hot(bidx0, c, dtype=blocks0.dtype)
        gath0 = jnp.einsum("...kc,...cw->...kw", oh0, blocks0).reshape(
            b, k * chunk)

        out[f"b{b}_stage_max_ms"] = round(device_loop_ms(
            chain(lambda x: jnp.max(x.reshape(b, c, chunk), axis=-1)),
            (blocks0.reshape(b, -1),)), 4)
        out[f"b{b}_stage_topk_blocks_ms"] = round(device_loop_ms(
            chain(lambda x: jax.lax.top_k(x, k)[0]), (maxes0,)), 4)
        out[f"b{b}_stage_gather_ms"] = round(device_loop_ms(
            chain(lambda x: jnp.einsum("...kc,...cw->...kw", oh0,
                                       x.reshape(b, c, chunk))),
            (blocks0.reshape(b, -1),)), 4)
        out[f"b{b}_stage_topk_final_ms"] = round(device_loop_ms(
            chain(lambda x: jax.lax.top_k(x, k)[0]), (gath0,)), 4)

    # ---- post-two-level decomposition: where do the remaining ms go? ----
    # pick-only (gathered_top_k at the serving pull width) vs the full
    # sample_topk_with_ngram — the difference is ngram machinery + the
    # lax.cond fallback scaffolding (whose untaken branch still carries
    # the full logits operand)
    from image2text_tpu.models.sampling import gathered_top_k

    for b in (256, 1024):
        logits = jax.random.normal(jax.random.PRNGKey(4), (b, V),
                                   jnp.bfloat16)

        def body_pick(i, c):
            (x,) = c
            vals, idx = gathered_top_k(x, 32)
            s = jnp.sum(vals.astype(jnp.float32), axis=-1)
            return (x + s[:, None].astype(x.dtype) * 1e-6,)

        out[f"b{b}_pick32_only_ms"] = round(
            device_loop_ms(body_pick, (logits,)), 4)

        # sub-ops of the two-level gathered_top_k (k=32, chunk=128)
        kk = 32
        c2 = -(-V // 128)
        blk = jnp.pad(logits, ((0, 0), (0, c2 * 128 - V)),
                      constant_values=-jnp.inf).reshape(b, c2, 128)
        _, bi = jax.lax.top_k(jnp.max(blk, axis=-1), kk)
        oh2 = jax.nn.one_hot(bi, c2, dtype=blk.dtype)
        gath2 = jnp.einsum("...kc,...cw->...kw", oh2,
                           jnp.maximum(blk, jnp.asarray(-1e38, blk.dtype)))
        v1_, i1_ = jax.lax.top_k(gath2, kk)
        v1f = v1_.reshape(b, kk * kk)
        _, gi_ = jax.lax.top_k(v1f, kk)

        def chain2(fn, x0):
            def body(i, carry):
                (x,) = carry
                y = fn(x)
                y = jnp.maximum(y.astype(jnp.float32), -1e4)
                s = jnp.sum(y, axis=tuple(range(1, y.ndim)))
                s = s.reshape(b, *([1] * (x.ndim - 1)))
                return (x + s.astype(x.dtype) * jnp.asarray(1e-6, x.dtype),)
            return device_loop_ms(body, (x0,))

        out[f"b{b}_sub_topk3d_ms"] = round(
            chain2(lambda x: jax.lax.top_k(x, kk)[0], gath2), 4)
        out[f"b{b}_sub_topk_flat_ms"] = round(
            chain2(lambda x: jax.lax.top_k(x, kk)[0], v1f), 4)
        out[f"b{b}_sub_taa_ms"] = round(
            chain2(lambda x: jnp.take_along_axis(x, gi_, axis=-1), v1f), 4)
    out["calib_after_tflops"] = round(quick_calib(), 1)
    out["device_kind"] = getattr(jax.devices()[0], "device_kind", "?")
    print(json.dumps(out), flush=True)
    with open("PROBE_SAMPLER.jsonl", "a") as f:
        f.write(json.dumps(out) + "\n")


if __name__ == "__main__":
    main()
