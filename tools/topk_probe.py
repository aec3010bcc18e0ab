"""On-chip probe: fastest EXACT top-k formulation over a 50k vocab.

The decode-slope profile (PROFILE_DECODE_SLOPE.json, robust estimator,
batch 256) puts the cached decoder step at 1.19 ms — essentially its
1.26 ms HBM floor — while the sampling stage costs ~5.5 ms/step, almost
all of it in the chunked top-(k+margin) pull over the (B, 50258) logits
(the read itself floors at 0.06 ms).  This probe slope-times candidate
formulations, all EXACT (bit-identical winners):

* ``chunk2048`` … ``chunk256`` — models/sampling.chunked_top_k at
  different chunk widths (stage-1 sort cost scales with chunk log²chunk)
* ``fullrow``   — plain jax.lax.top_k over the whole row
* ``approx_r1`` — jax.lax.approx_max_k(recall_target=1.0): on TPU this
  lowers to the PartialReduce ApproxTopK custom call; exactness at
  recall 1.0 is VALIDATED here against the chunked reference on random
  draws before it is timed (adopt only if exact)
* ``approx_gap`` — approx_max_k(recall_target=0.95) — speed headroom
  context only, never adopted (approximate)

Methodology identical to tools/decode_slope.py: each formulation runs in
a fori_loop whose input depends on the previous iteration's output (no
hoisting), slope between two iteration counts cancels dispatch, min over
attempts inside calibration-gated windows.

Usage: python tools/topk_probe.py [batch] [k]
Appends one JSON line to PROBE_TOPK.jsonl.
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

from image2text_tpu.models.sampling import (_chunked_sort_top_k,
                                            gathered_top_k)

LO, HI = 8, 104
VOCAB = 50258


def fenced_s(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    return time.perf_counter() - t0


def main(batch: int, k: int):
    from bench_kernels import quick_calib

    rng = np.random.default_rng(0)
    logits0 = jnp.asarray(rng.standard_normal((batch, VOCAB)), jnp.float32)

    def mk(select):
        """fori_loop chain: perturb the logits with the previous winners'
        values so each iteration's top-k depends on the last (no hoist)."""
        def run(n):
            def fn(logits):
                def body(i, carry):
                    logits, acc = carry
                    vals, idx = select(logits)
                    # fold the winners back in: tiny scatter, keeps the
                    # (B, V) array live and the chain serial
                    logits = logits.at[jnp.arange(logits.shape[0])[:, None],
                                       idx].add(1e-6)
                    return logits, acc + jnp.sum(vals)

                _, acc = jax.lax.fori_loop(
                    0, n, body, (logits, jnp.zeros((), jnp.float32)))
                return acc

            return jax.jit(fn)

        return run(LO), run(HI)

    def chunked(c):
        return lambda l: _chunked_sort_top_k(l, k, chunk=c)

    def gathered(c, oh=False):
        return lambda l: gathered_top_k(l, k, chunk=c, onehot_gather=oh)

    variants = {
        "chunk2048": mk(chunked(2048)),
        "chunk1024": mk(chunked(1024)),
        "chunk512": mk(chunked(512)),
        "chunk256": mk(chunked(256)),
        "fullrow": mk(lambda l: jax.lax.top_k(l, k)),
        "gather128": mk(gathered(128)),
        "gather256": mk(gathered(256)),
        "gather512": mk(gathered(512)),
        "gather64_oh": mk(gathered(64, oh=True)),
        "gather128_oh": mk(gathered(128, oh=True)),
        "gather256_oh": mk(gathered(256, oh=True)),
    }

    # --- approx_max_k exactness validation (recall_target=1.0) -------------
    def approx_r1(l):
        return jax.lax.approx_max_k(l, k, recall_target=1.0,
                                    aggregate_to_topk=True)

    exact = True
    try:
        for seed in range(5):
            r = np.random.default_rng(seed)
            x = jnp.asarray(r.standard_normal((batch, VOCAB)), jnp.float32)
            va, _ = jax.jit(approx_r1)(x)
            vb, _ = jax.jit(lambda l: _chunked_sort_top_k(l, k, 2048))(x)
            if not np.array_equal(np.asarray(va), np.asarray(vb)):
                exact = False
                break
    except Exception as e:  # missing lowering on some backends
        print(f"approx_max_k unavailable: {e}", flush=True)
        exact = None
    if exact:
        variants["approx_r1"] = mk(approx_r1)
    if exact is not None:
        variants["approx_gap"] = mk(
            lambda l: jax.lax.approx_max_k(l, k, recall_target=0.95,
                                           aggregate_to_topk=True))

    for lo, hi in variants.values():
        jax.block_until_ready(lo(logits0))
        jax.block_until_ready(hi(logits0))

    out = {"batch": batch, "k": k, "vocab": VOCAB,
           "approx_r1_exact_on_random": exact,
           "calib_before_tflops": round(quick_calib(), 1)}
    for name, (lo, hi) in variants.items():
        los = [fenced_s(lo, logits0) for _ in range(4)]
        his = [fenced_s(hi, logits0) for _ in range(4)]
        ms = (min(his) - min(los)) / (HI - LO) * 1e3
        out[f"{name}_ms"] = round(ms, 4)
    out["calib_after_tflops"] = round(quick_calib(), 1)
    out["device_kind"] = getattr(jax.devices()[0], "device_kind", "?")
    print(json.dumps(out))
    with open("PROBE_TOPK.jsonl", "a") as f:
        f.write(json.dumps(out) + "\n")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 256,
         int(sys.argv[2]) if len(sys.argv) > 2 else 48)
