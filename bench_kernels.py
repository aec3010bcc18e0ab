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

# Per-timing window budget.  The pooled chip timeshares with other
# tenants in phases that can be SHORTER than a leisurely measurement —
# KERNEL_BENCH_TARGET_S shrinks each timing so a whole row (4 timings +
# 2 bracket probes) fits inside one healthy window.
import os as _os  # noqa: E402

TARGET_S = float(_os.environ.get("KERNEL_BENCH_TARGET_S", "2.0"))


def _run_loop(body, carry0, iters, reps):
    f = jax.jit(lambda c, n=iters: jax.lax.fori_loop(0, n, body, c))
    out = f(carry0)
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = f(carry0)
        # fence: D2H a FEW BYTES that data-depend on the result.  The
        # device-side ravel/slice is one extra constant-cost dispatch
        # (cancelled by the slope); converting the whole array instead
        # (the pre-round-3 bug) pushed megabytes through the tunnel per
        # window, and that transfer's jitter (±50-150 ms observed)
        # swamped the compute delta the slope divides by.
        np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:8])
        ts.append(time.perf_counter() - t0)
    # min: fenced time = device compute + tunnel jitter (>= one RPC); the
    # minimum approaches compute + the RPC floor, which the slope cancels
    return min(ts)


def device_loop_ms(body, carry0, target_s=None, reps=3) -> float:
    """Pure device ms per iteration of ``body``: run the op inside an
    on-device fori_loop at two iteration counts auto-scaled so the high
    window's COMPUTE dominates the tunnel's RPC jitter (observed up to
    ~1 s per dispatch), then take the slope."""
    if target_s is None:
        target_s = TARGET_S
    # estimate per-iteration compute from the DIFFERENCE of two probes:
    # a single probe's wall time is dominated by dispatch/RPC overhead
    # (the pre-round-3 bug: per-iter was overestimated ~100x, so ``hi``
    # stayed at 16 and the slope measured pure noise)
    probe8 = _run_loop(body, carry0, 8, 2)
    probe64 = _run_loop(body, carry0, 64, 2)
    per = max((probe64 - probe8) / 56.0, 1e-6)
    # quantize to a power of two: repeat runs then reuse the SAME compiled
    # fori_loop from the persistent cache — compile traffic through the
    # tunnel is itself a major source of measurement-window contamination
    hi = 128
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


def quick_calib() -> float:
    """Cheap (~2 s) sustained-matmul probe used to BRACKET each row: the
    tunnel degrades in phases shorter than a full sweep, so row validity
    requires a healthy reading immediately before AND after the row."""
    n = 2048
    x = jax.random.normal(jax.random.PRNGKey(0), (n, n), jnp.bfloat16)

    def body(i, c):
        a, xx = c
        return ((a @ xx) * 0.5 + xx * 0.1, xx)

    ms = device_loop_ms(body, (x, x), target_s=1.0, reps=2)
    return 2 * n ** 3 / ms / 1e9 if ms > 0 else 0.0


def attention_specs():
    """Measurement specs for the attention table: one spec per (seq,
    metric).  ``flops`` is the causal-adjusted useful work per iteration,
    used only as a plausibility bound on slopes."""
    B, H, D = 8, 8, 128  # flagship MQA layout (kv heads = 1)
    specs = []
    for s in (320, 1024, 2048, 4096):
        k0 = jax.random.PRNGKey(0)
        q = jax.random.normal(k0, (B, H, s, D), jnp.bfloat16)
        k = jax.random.normal(k0, (B, 1, s, D), jnp.bfloat16)
        v = jax.random.normal(k0, (B, 1, s, D), jnp.bfloat16)
        bias = _causal_bias(s, s)

        def fwd_body(attn_fn, k=k, v=v):
            def body(i, qq):
                out = attn_fn(qq, k, v)
                return qq + EPS * out.astype(qq.dtype)
            return body

        def bwd_body(attn_fn, k=k, v=v):
            def loss(qq, kk, vv):
                return jnp.sum(attn_fn(qq, kk, vv).astype(jnp.float32))
            g = jax.grad(loss, argnums=0)

            def body(i, qq):
                return qq + EPS * g(qq, k, v).astype(qq.dtype)
            return body

        flash_fn = lambda qq, kk, vv: flash_sdpa(qq, kk, vv, None, True)
        xla_fn = (lambda qq, kk, vv, bias=bias:
                  _xla_attention(qq, kk, vv, bias))
        f_fwd = 2.0 * B * H * s * s * D   # causal half of 4*B*H*s^2*D
        f_bwd = 3.5 * f_fwd
        specs += [
            ("attention", s, "fwd_flash_ms", fwd_body(flash_fn), q, f_fwd),
            ("attention", s, "fwd_xla_ms", fwd_body(xla_fn), q, f_fwd),
            ("attention", s, "fwdbwd_flash_ms", bwd_body(flash_fn), q, f_bwd),
            ("attention", s, "fwdbwd_xla_ms", bwd_body(xla_fn), q, f_bwd),
        ]
    return specs


def _causal_bias(sq, skv):
    i = jnp.arange(sq)[:, None]
    j = jnp.arange(skv)[None, :]
    return jnp.where(j <= i + (skv - sq), 0.0, -jnp.inf)[None, None]


def int4_specs():
    from image2text_tpu.ops import int4_matmul as int4_mod
    from image2text_tpu.ops.int4_matmul import (
        dequantize_int4,
        int4_matmul,
        quantize_pack_int4,
    )

    int4_mod.INT4_KERNEL = "pallas"  # the sweep measures the KERNEL vs XLA

    specs = []
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

        flops = 2.0 * n * fin * fout
        key = (n, fin, fout)
        specs += [
            ("int4_matmul", key, "pallas_fused_ms",
             body_of(lambda xx, p=packed, s_=scales:
                     int4_matmul(xx, p, s_)), x, flops),
            ("int4_matmul", key, "xla_dequant_dot_ms",
             body_of(lambda xx, p=packed, s_=scales:
                     xx @ dequantize_int4(p, s_).astype(xx.dtype).T),
             x, flops),
            ("int4_matmul", key, "bf16_dot_ms",
             body_of(lambda xx, w_=wb: xx @ w_.T), x, flops),
        ]
    return specs


def _try(fn, fallback):
    try:
        return fn()
    except Exception as e:  # tunnel/backend failures must not lose the run
        print(f"SECTION FAILED: {type(e).__name__}: {str(e)[:200]}",
              flush=True)
        return fallback


# plausibility ceiling: nothing legitimately sustains more than ~1.2x the
# chip's bf16 peak on these ops — faster slopes are broken windows
# (observed: a "566 TFLOP/s" calibration during a phase flip).  The peak
# comes from the device kind (bench.py's table), not a hardcoded v5e.
_SUPPORT_RTOL = 0.15  # a metric is resolved when >=2 samples sit within
_MIN_SUPPORT = 2      # 15% of the plausible minimum


def _peak_tflops() -> float:
    # NOT `from bench import ...`: importing bench runs its module-level
    # setup_compile_cache(), repointing the cache dir mid-measurement
    from image2text_tpu.utils.device import chip_peak_bf16_flops

    return chip_peak_bf16_flops(jax.devices()[0]) / 1e12 * 1.2


def _resolved(samples, flops):
    """(best_ms, support) over plausible samples; None until resolvable."""
    floor_ms = flops / (_peak_tflops() * 1e9)  # faster than peak => garbage
    ok = [t for t in samples if t > floor_ms]
    if not ok:
        return None, 0
    m = min(ok)
    support = sum(1 for t in ok if t <= m * (1 + _SUPPORT_RTOL))
    return m, support


_CALIB_MIN = 100.0  # TFLOP/s; healthy v5e sustains ~200 on the probe


def _samples_path() -> str:
    """Repo-local sample store, keyed by device kind: timings from one chip
    generation must never resolve metrics for another."""
    kind = getattr(jax.devices()[0], "device_kind", "unknown")
    slug = "".join(c if c.isalnum() else "-" for c in kind.lower())
    return f".kernel_samples-{slug}.json"


def _load_samples():
    import os
    path = _samples_path()
    if not os.path.exists(path):
        return {}
    try:
        with open(path) as f:
            raw = json.load(f)
        return {tuple(eval(k)): v for k, v in raw.items()}  # keys we wrote
    except Exception:
        return {}


def _save_samples(samples):
    with open(_samples_path(), "w") as f:
        json.dump({repr(k): v for k, v in samples.items()}, f)


def main():
    import os
    import time as _time

    dev = jax.devices()[0]
    # The pooled chip timeshares with other tenants in phases; any single
    # window can be slowed arbitrarily.  Policy (VERDICT r2 item 3):
    # measure ONLY inside calibration-bracketed windows — a quick sustained
    # -matmul probe must read >= _CALIB_MIN TFLOP/s immediately before AND
    # after each chunk of metrics, otherwise the chunk's samples are
    # discarded.  On top of that, a metric is accepted only once its
    # minimum is REPRODUCED (>=2 healthy-window samples within 15%).
    # Samples persist per device kind (see _samples_path) so interrupted
    # runs resume without blending chips.
    wait_min = float(os.environ.get("KERNEL_BENCH_WAIT_MIN", "0"))
    deadline = _time.time() + wait_min * 60
    calib = _try(quick_calib, 0.0)
    print(f"initial calibration: {calib:.1f} TFLOP/s (context only)",
          flush=True)

    specs = attention_specs() + int4_specs()
    samples = _load_samples()   # (section, key, metric) -> [ms, ...]
    resolved = {}  # (section, key, metric) -> (ms, support)

    def _resolve_all():
        for (section, key, metric, _b, _c, flops) in specs:
            sid = (section, key, metric)
            if sid in resolved:
                continue
            m, support = _resolved(samples.get(sid, []), flops)
            if m is not None and support >= _MIN_SUPPORT:
                resolved[sid] = (m, support)

    _resolve_all()
    if resolved:
        print(f"resumed: {len(resolved)}/{len(specs)} metrics already "
              f"resolved from persisted healthy-window samples", flush=True)
    attempt = 0
    chunk_n = 3
    # do-while: at least one measurement attempt even with WAIT_MIN=0 —
    # the deadline bounds *waiting-room* time, it must not gate the first
    # pass (a zero deadline used to exit before measuring anything)
    while len(resolved) < len(specs) and (
            attempt == 0 or _time.time() <= deadline):
        attempt += 1
        c0 = _try(quick_calib, 0.0)
        if c0 < _CALIB_MIN:
            print(f"attempt {attempt}: calib {c0:.0f} TFLOP/s — degraded, "
                  f"waiting", flush=True)
            _time.sleep(20)
            continue
        todo = [s for s in specs if (s[0], s[1], s[2]) not in resolved]
        for i in range(0, len(todo), chunk_n):
            chunk = todo[i:i + chunk_n]
            pending = []
            for (section, key, metric, body, carry0, flops) in chunk:
                t = _try(lambda b=body, c=carry0: device_loop_ms(b, c), 0.0)
                if t > 0:
                    pending.append(((section, key, metric), t))
            c1 = _try(quick_calib, 0.0)
            if c1 >= _CALIB_MIN:  # bracket holds: the chunk ran healthy
                for sid, t in pending:
                    samples.setdefault(sid, []).append(t)
                _save_samples(samples)
            else:
                print(f"attempt {attempt}: post-chunk calib {c1:.0f} "
                      f"TFLOP/s — chunk discarded", flush=True)
                break  # phase flipped; back to the waiting loop
        _resolve_all()
        print(f"attempt {attempt}: {len(resolved)}/{len(specs)} metrics "
              f"resolved", flush=True)

    def best(section, key, metric):
        sid = (section, key, metric)
        if sid in resolved:
            return resolved[sid][0], resolved[sid][1], True
        m, support = _resolved(samples.get(sid, []), dict(
            (s[:3], s[5]) for s in specs)[sid])
        return (m if m is not None else 0.0), support, False

    def ratio(a, b):
        return round(a / b, 2) if a > 0 and b > 0 else None

    attention = []
    for s in (320, 1024, 2048, 4096):
        vals = {}
        valid = True
        for metric in ("fwd_xla_ms", "fwd_flash_ms", "fwdbwd_xla_ms",
                       "fwdbwd_flash_ms"):
            m, support, ok = best("attention", s, metric)
            vals[metric] = round(m, 3)
            vals[metric.replace("_ms", "_support")] = support
            valid &= ok
        attention.append({
            "seq": s, "batch": 8, "heads": 8, "head_dim": 128, **vals,
            "fwd_speedup": ratio(vals["fwd_xla_ms"], vals["fwd_flash_ms"]),
            "fwdbwd_speedup": ratio(vals["fwdbwd_xla_ms"],
                                    vals["fwdbwd_flash_ms"]),
            "valid": valid,
        })
    int4 = []
    for key in ((256, 1024, 4096), (256, 1600, 6400), (512, 4096, 4096)):
        vals = {}
        valid = True
        for metric in ("pallas_fused_ms", "xla_dequant_dot_ms",
                       "bf16_dot_ms"):
            m, support, ok = best("int4_matmul", key, metric)
            vals[metric] = round(m, 4)
            vals[metric.replace("_ms", "_support")] = support
            valid &= ok
        n, fin, fout = key
        int4.append({
            "tokens": n, "in": fin, "out": fout, **vals,
            "fused_vs_xla_dequant": ratio(vals["xla_dequant_dot_ms"],
                                          vals["pallas_fused_ms"]),
            "fused_vs_bf16": ratio(vals["bf16_dot_ms"],
                                   vals["pallas_fused_ms"]),
            "valid": valid,
        })

    all_valid = all(r["valid"] for r in attention + int4)
    result = {
        "device_kind": getattr(dev, "device_kind", "?"),
        "platform": str(dev.platform),
        "dtype": "bfloat16",
        "timing": "on-device fori_loop two-point slope; samples taken only "
                  "inside calibration-bracketed windows (sustained-matmul "
                  "probe >=100 TFLOP/s before AND after each chunk), "
                  "implausibly-fast slopes (>236 TFLOP/s implied) "
                  "discarded, accepted once the minimum is reproduced by "
                  ">=2 healthy-window samples within 15%",
        "calibration_gate_tflops": _CALIB_MIN,
        "initial_calibration_tflops": round(calib, 1),
        "attempts": attempt,
        "decision_grade": all_valid,
        "attention": attention,
        "int4_matmul": int4,
    }
    with open("BENCH_KERNELS.json", "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
