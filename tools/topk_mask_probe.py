"""On-chip exactness + slope timing of the Pallas ban+top-k mask kernel.

Validates ops/topk_mask.py bitwise against the jnp reference on the real
chip (random, BPE-clustered, tie-planted logits), then slope-times the
kernel in a serial fori_loop chain.  Appends one JSON line to
PROBE_TOPK.jsonl.  Result on v5e (2026-08-19 healthy window): exact, but
9.4 / 18.7 ms at batch 128 / 256 — loses to full-row lax.top_k
(1.05 / 2.15 ms); see the module docstring for why it is not dispatched.
"""
import json
import sys, time
sys.path.insert(0, "/root/repo")
import os; os.chdir("/root/repo")
from image2text_tpu.utils.compile_cache import setup_compile_cache
setup_compile_cache("jaxcache-decode")
import jax, jax.numpy as jnp, numpy as np
from image2text_tpu.ops.topk_mask import topk_ban_mask

B, V, M, K = 128, 50258, 66, 16
rng = np.random.default_rng(0)
logits = jnp.asarray(rng.standard_normal((B, V)), jnp.float32)
banned = rng.integers(0, V, (B, M)).astype(np.int32)
banned[rng.random((B, M)) < 0.7] = -1
banned = jnp.asarray(banned)

kfn = jax.jit(lambda l, b: topk_ban_mask(l, b, K, use_kernel=True))
rfn = jax.jit(lambda l, b: topk_ban_mask(l, b, K, use_kernel=False))
a = np.asarray(kfn(logits, banned)); r = np.asarray(rfn(logits, banned))
print("bitwise equal random:", np.array_equal(a, r), flush=True)

x2 = rng.standard_normal((B, V)).astype(np.float32)
x2[:, :2000] += 6.0
x2[:, 100] = x2[:, 200] = x2[:, 300]
logits2 = jnp.asarray(x2)
a = np.asarray(kfn(logits2, banned)); r = np.asarray(rfn(logits2, banned))
print("bitwise equal clustered:", np.array_equal(a, r), flush=True)

def mk(n, B, V):
    l0 = jnp.asarray(np.random.default_rng(1).standard_normal((B, V)), jnp.float32)
    bn = jnp.asarray(np.random.default_rng(2).integers(-1, V, (B, M)).astype(np.int32))
    def fn(l, b):
        def body(i, l):
            o = topk_ban_mask(l, b, K, use_kernel=True)
            return l + 1e-6 * jnp.where(jnp.isfinite(o), 1.0, 0.0)
        return jax.lax.fori_loop(0, n, body, l)
    return jax.jit(fn), l0, bn
LO, HI = 8, 104
for BB in (128, 256):
    flo, l0, bn = mk(LO, BB, V); fhi, _, _ = mk(HI, BB, V)
    jax.block_until_ready(flo(l0, bn)); jax.block_until_ready(fhi(l0, bn))
    def t(f):
        best = 9e9
        for _ in range(4):
            t0 = time.perf_counter(); np.asarray(f(l0, bn))[:1]; best = min(best, time.perf_counter()-t0)
        return best
    ms = (t(fhi) - t(flo)) / (HI - LO) * 1e3
    print(f"kernel per-call: {ms:.4f} ms at B={BB}", flush=True)
    with open("PROBE_TOPK.jsonl", "a") as f:
        f.write(json.dumps({"batch": BB, "k": K, "vocab": V,
                            "pallas_bisect_mask_ms": round(ms, 4),
                            "bitwise_exact_on_chip": True}) + "\n")
