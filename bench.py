"""Benchmark: end-to-end caption generation throughput on the local device.

Prints ONE JSON line (the LAST line of stdout):
    {"metric": "captions_per_sec", "value": N, "unit": "captions/s",
     "vs_baseline": N, "mfu": ..., "flops_per_caption": ...,
     "batch_scaling": [...], ...}

The reference publishes no numbers (BASELINE.md); ``vs_baseline`` is
measured against the driver's north-star target of 5,000 Flickr30K
captions/sec on a v5e-8 (BASELINE.json), scaled to the number of available
chips — i.e. the single-chip target is 5000/8 captions/sec.

**Budget discipline (round-4 rework).** Round 3's bench grew a 12-minute
calibration gate plus six jitted variants x four batch shapes of cold
compiles and timed out under the driver (BENCH_r03.json rc=124).  The
default mode now measures ONLY the numerics-exact headline path over two
batch shapes (two compiles), caps the calibration wait at
``BENCH_WAIT_MIN`` (default 3) minutes — recording a
``calibration_healthy`` flag instead of sleeping past the cap — and
prints ``# phase`` heartbeats so a timeout tail is diagnosable.  The
secondary serving modes (int8 cross-KV, W8A8 weights, approx-top-k,
all-stacked, beam search) run only under ``BENCH_FULL=1`` (manual
measurement sessions; see BENCH_QUEUE_* artifacts), each phase gated on
a global ``BENCH_BUDGET_S`` deadline, with the headline JSON printed
FIRST so even a truncated full run still yields the gate number.

Methodology (every claim must be physically verifiable):

* **FLOP accounting.** Per-call FLOPs come from XLA's own cost model
  (``compiled.cost_analysis()['flops']``) on the exact compiled program,
  cross-checked against an analytic matmul-term estimate of the same
  architecture (``analytic_flops_per_caption``).  The JSON emits
  ``flops_per_caption``, ``implied_flops_per_sec`` and ``mfu`` against the
  chip's bf16 peak — an MFU >= 1.0 would mean the timing is broken, and the
  script fails loudly rather than print it.
* **Fenced timing.** Each timed window chains a data dependency through
  every iteration (iteration i+1's prompt is sliced from iteration i's
  output) and ends with ``np.asarray(out)`` — a device→host copy of the
  result bytes — so the window cannot close before the device finished
  *computing* (``block_until_ready`` alone proved unreliable through the
  axon tunnel: round-1 recorded flat latency across an 8x batch sweep,
  i.e. it fenced dispatch, not execution).
* **Batch scaling sanity.** Latency across the 4x batch step (256→1024)
  must grow >=1.5x once compute-bound; flat scaling fails the run.

The benched pipeline is the real serving path: raw uint8 frames →
on-device fused preprocessing → encoder → KV-cached batched sampling
(top-k, temperature, no-repeat-ngram) on the ``tpu/nano-mini.yaml``
flagship architecture with randomly initialised weights (quality is
benchmarked by training runs, not here — see QUALITY_r04.json).
"""
from __future__ import annotations

import json
import os
import time

import numpy as np

import jax

from image2text_tpu.utils.compile_cache import setup_compile_cache

setup_compile_cache()
import jax.numpy as jnp

MAX_NEW_TOKENS = 32
PROMPT_LEN = 1
NORTH_STAR_V5E8 = 5000.0  # captions/sec on 8 chips (BASELINE.json)
# BENCH_SMOKE=1: tiny model + small batches — validates the bench pipeline
# (incl. the multi-device sharded path on a CPU mesh) without a TPU
SMOKE = os.environ.get("BENCH_SMOKE") == "1"
# BENCH_FULL=1: also measure the secondary serving modes (manual sessions)
FULL = os.environ.get("BENCH_FULL") == "1"
BATCHES = (8, 16) if SMOKE else (256, 1024)
FULL_BATCHES = (8, 16) if SMOKE else (128, 256, 512, 1024)

_T0 = time.time()
_BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "1500"))

# bf16 peak FLOP/s per chip (shared table; importable without this
# module's compile-cache side effects)
from image2text_tpu.utils.device import chip_peak_bf16_flops as chip_peak_flops  # noqa: E402,E501


def _time_left() -> float:
    return _BUDGET_S - (time.time() - _T0)


def _phase(name: str) -> None:
    print(f"# phase [{time.time() - _T0:6.0f}s] {name}", flush=True)


def fast_calib(hard_cap_s: float = 150.0):
    """Crude-but-bounded sustained-matmul health probe.

    bench_kernels.quick_calib compiles 4-5 separate fori_loop programs
    (slope method) — minutes of cold remote-compile through the axon
    tunnel before any measurement, which is exactly how round 3's bench
    starved the driver timeout.  This probe compiles ONE program (dynamic
    trip count), warms it with 8 iterations, then times a single long
    window whose compute (~4 s healthy) dominates the tunnel's RPC
    jitter.  Accuracy is ~±25% worst-case — plenty for the >100 TFLOP/s
    health gate.  A SIGALRM hard cap bounds the whole call; on timeout
    returns None (recorded as calibration_timeout).
    """
    import signal

    n = 2048
    flops_per_iter = 2.0 * n ** 3

    def body(i, c):
        a, xx = c
        return ((a @ xx) * 0.5 + xx * 0.1, xx)

    @jax.jit
    def run(x, iters):
        return jax.lax.fori_loop(0, iters, body, (x, x))[0]

    class _Timeout(Exception):
        pass

    def _raise(signum, frame):
        raise _Timeout

    old = signal.signal(signal.SIGALRM, _raise)
    signal.alarm(int(hard_cap_s))
    try:
        x = jax.random.normal(jax.random.PRNGKey(0), (n, n), jnp.bfloat16)
        np.asarray(run(x, 8)[:1, :1])  # compile + warm
        iters = 40000  # ~4 s of compute on a healthy v5e
        t0 = time.perf_counter()
        np.asarray(run(x, iters)[:1, :1])
        dt = time.perf_counter() - t0
        return iters * flops_per_iter / dt / 1e12
    except _Timeout:
        return None
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old)


def analytic_flops_per_caption(cfg, max_new_tokens: int,
                               prompt_len: int) -> float:
    """Matmul-term FLOP estimate (2·m·k·n) for one caption through the
    flagship serving path: encoder forward + cached prefill + per-token
    decode.  Elementwise/softmax terms are ignored (<2% of total).

    Cross-checks the XLA cost model; the two must agree within ~2x.
    """
    enc = cfg.model.vision_encoder_config
    dec = cfg.model.decoder_config
    etc, dtc = enc.transformer_config, dec.transformer_config
    d = etc.attn_config.n_embd
    fl = 0.0

    # --- encoder -----------------------------------------------------------
    h = w = enc.input.width
    cin = enc.input.n_channels
    ks = enc.feature_extractor_kernel_size[0] ** 2
    for cout in list(enc.feature_extractor_gate_sizes) + [enc.n_channels]:
        fl += 2.0 * h * w * ks * cin * cout  # 'same' conv keeps HxW
        cin = cout
    n_patch = enc.num_patches ** 2
    patch_dim = enc.n_channels * (h // enc.num_patches) ** 2
    fl += 2.0 * n_patch * patch_dim * d  # patch projection

    s_full = n_patch + enc.n_cls
    s = (int(etc.sparsity_factor * etc.max_block_size)
         if etc.is_sparse_attn else s_full)

    def moe_linear(fin, fout, rc):
        gate = 2.0 * fin * rc.gate_sizes[0] + 2.0 * rc.gate_sizes[0] * rc.num_experts
        per_expert = 2.0 * fin * rc.proj_features + 2.0 * rc.proj_features * fout
        return gate + rc.top_k * per_expert

    def block_flops(tc, n_tokens, kv_len, cross_len=0):
        ac = tc.attn_config
        dd = ac.n_embd
        kv_dim = 2 * (dd // ac.n_head) if ac.attn_type.value == "multi_query" else 2 * dd
        per_tok = 2.0 * dd * dd            # q proj
        per_tok += 2.0 * dd * kv_dim       # kv proj
        per_tok += 2.0 * 2.0 * kv_len * dd  # scores + weighted sum (all heads)
        per_tok += 2.0 * dd * dd           # out proj
        if cross_len:
            per_tok += 2.0 * dd * dd       # cross q proj
            per_tok += 2.0 * 2.0 * cross_len * dd
            per_tok += 2.0 * dd * dd       # cross out proj
        if tc.rotator_config is not None:
            hidden = tc.rotator_config.ff_mult_factor * dd
            per_tok += moe_linear(dd, hidden, tc.rotator_config)
            per_tok += moe_linear(hidden, dd, tc.rotator_config)
        else:
            hidden = 4 * dd
            per_tok += 2.0 * dd * hidden * 2
        return per_tok * n_tokens

    fl += enc.n_layer * block_flops(etc, s, s)

    # --- decode ------------------------------------------------------------
    cross_len = enc.n_cls if cfg.model.use_cross_attn else 0
    if cross_len:
        # per-layer cross K/V precompute, once per caption
        fl += dec.n_layer * 2.0 * cross_len * d * (2 * d)
    s_dec = (int(dtc.sparsity_factor * dtc.max_block_size)
             if dtc.is_sparse_attn else dec.block_size)
    cache_len = min(enc.n_cls + prompt_len + max_new_tokens, s_dec)
    n_toks = prompt_len + max_new_tokens
    fl += dec.n_layer * block_flops(dtc, n_toks, cache_len,
                                    cross_len=cross_len)
    fl += 2.0 * n_toks * d * dec.vocab_size  # lm_head
    return fl


def _build():
    from __graft_entry__ import _flagship_config
    from image2text_tpu.models.vision_encoder_decoder import VisionEncoderDecoder
    from image2text_tpu.ops.preprocess import resize_normalize_on_device

    dev = jax.devices()[0]
    cfg = _flagship_config(tiny=SMOKE)
    model = VisionEncoderDecoder(cfg.model)
    # multi-chip serving: params replicated, batch sharded P('data') over
    # every available chip — XLA partitions the whole compiled generate
    # (scales the v5e-8 north-star setup; single chip reduces to the
    # device_put below)
    if len(jax.devices()) > 1:
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        mesh = Mesh(np.asarray(jax.devices()), ("data",))
        put_params = lambda t: jax.device_put(t, NamedSharding(mesh, P()))
        data_sharding = NamedSharding(mesh, P("data"))
    else:
        put_params = lambda t: jax.device_put(t, dev)
        data_sharding = dev
    params = put_params(model.init(jax.random.PRNGKey(0)))
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if jnp.issubdtype(x.dtype, jnp.floating) else x, params)

    im_size = cfg.model.vision_encoder_config.input.width

    def gen(params, raw, prompt, rng, cross_kv_quant=None,
            approx_top_k=False):
        images = resize_normalize_on_device(raw, im_size,
                                            out_dtype=jnp.bfloat16)
        return model.generate(params, images, prompt,
                              max_new_tokens=MAX_NEW_TOKENS,
                              temperature=0.7, top_k=16, rng=rng,
                              cross_kv_quant=cross_kv_quant,
                              approx_top_k=approx_top_k)

    gen_int8 = jax.jit(lambda p, raw, pr, rng: gen(p, raw, pr, rng, "int8"))
    gen_approx = jax.jit(
        lambda p, raw, pr, rng: gen(p, raw, pr, rng, None, True))
    gen_all = jax.jit(
        lambda p, raw, pr, rng: gen(p, raw, pr, rng, "int8", True))

    def build_params_w8():
        """Full int8 serving params: W8A8 decoder weights benched together
        with int8 cross-KV — the decoder re-reads its weights every decode
        step, so halving weight bytes stacks with halving the cross-KV
        term.  Built lazily inside the fail-soft int8 block: a W8A8
        failure (or the extra decoder copy at the HBM limit) must not
        take down the headline number."""
        from image2text_tpu.models.quantization import int8_serving_params

        params_w8 = dict(params)
        params_w8["decoder"] = put_params(
            int8_serving_params(model.decoder, params["decoder"]))
        return params_w8

    return (cfg, params, build_params_w8, jax.jit(gen), gen_int8,
            gen_approx, gen_all, dev, data_sharding)


def _inputs(batch, sharding):
    rng = np.random.default_rng(0)
    size = 80 if SMOKE else None
    raw = jax.device_put(jnp.asarray(
        rng.integers(0, 256, (batch, size or 160, size and size // 2 * 3 or 240, 3)),
        jnp.uint8), sharding)
    prompt = jax.device_put(jnp.ones((batch, PROMPT_LEN), jnp.int32),
                            sharding)
    return raw, prompt


def _bench_beam(cfg, params, dev, data_sharding, flops_analytic):
    """Fenced beam-search throughput (the reference's flagship generator,
    generation_utils.py:10-148): beam_width 3, beam_expansion_factor 4,
    32 new tokens.  Per-caption FLOPs ≈ beam_width x the sampling path's
    (each beam decodes through the full model; consolidation overhead is
    measured, not modelled)."""
    from image2text_tpu.models.generation_utils import BeamSearchTokenGenerator
    from image2text_tpu.models.vision_encoder_decoder import VisionEncoderDecoder

    model = VisionEncoderDecoder(cfg.model)
    gen = BeamSearchTokenGenerator(
        model, beam_width=3, beam_expansion_factor=4,
        temperature=0.7, top_k=16, max_new_tokens=MAX_NEW_TOKENS,
        eos_token_id=0,
        no_repeat_n_grams=tuple(cfg.model.no_repeat_n_grams))
    im_size = cfg.model.vision_encoder_config.input.width

    def beam_fn(params, raw, prompt, rng):
        from image2text_tpu.ops.preprocess import resize_normalize_on_device

        images = resize_normalize_on_device(raw, im_size,
                                            out_dtype=jnp.bfloat16)
        ids, scores = gen(params, images, prompt, rng=rng)
        return ids

    beam_j = jax.jit(beam_fn)
    batch = 8 if SMOKE else 64  # beams multiply memory/computation 3x
    raw, prompt = _inputs(batch, data_sharding)
    np.asarray(beam_j(params, raw, prompt, jax.random.PRNGKey(0)))  # warm
    iters = 2 if SMOKE else 4
    dts = []
    for s in range(3):
        t0 = time.perf_counter()
        out = None
        for i in range(iters):
            out = beam_j(params, raw, prompt,
                         jax.random.PRNGKey(100 + s * iters + i))
        np.asarray(out)  # D2H fence
        dts.append(time.perf_counter() - t0)
    dt = sorted(dts)[1]
    caps = batch * iters / dt
    flops = 3 * flops_analytic  # 3 beams decode the full model each
    peak = chip_peak_flops(dev) * max(1, len(jax.devices()))
    mfu = caps * flops / peak
    assert mfu < 1.0, f"beam MFU {mfu:.2f} >= 1: timing fence broken"
    return {
        "beam_captions_per_sec": round(caps, 2),
        "beam_batch": batch,
        "beam_width": 3,
        "beam_expansion_factor": 4,
        "beam_latency_ms": round(dt / iters * 1000.0, 2),
        "beam_mfu": round(mfu, 4),
    }


def _timed_window(gen_fn, params, raw, prompt, iters, seed):
    """One fenced timing window: iteration i+1 consumes iteration i's
    output (data-dependency chain), and the window closes on a full
    device→host copy of the final result."""
    t0 = time.perf_counter()
    p = prompt
    out = None
    for i in range(iters):
        out = gen_fn(params, raw, p, jax.random.PRNGKey(seed * iters + i + 1))
        # next prompt depends on this output: serialize on device
        p = jnp.maximum(out[:, :PROMPT_LEN], 1)
    fence = np.asarray(out)  # D2H copy: cannot complete before compute does
    dt = time.perf_counter() - t0
    assert fence.shape[0] == raw.shape[0]
    return dt


def _sweep(gen_fn, params, data_sharding, batches, warm_seed=0):
    """Latency sweep over batch shapes; returns (scaling table, per-batch
    latency dict)."""
    scaling, per_batch = [], {}
    for batch in batches:
        _phase(f"sweep batch={batch} (compile if cold)")
        raw, prompt = _inputs(batch, data_sharding)
        np.asarray(gen_fn(params, raw, prompt,
                          jax.random.PRNGKey(warm_seed)))  # warm/compile
        dts = sorted(_timed_window(gen_fn, params, raw, prompt, 4, s)
                     for s in range(3))
        lat_ms = dts[1] / 4 * 1000.0  # median window
        scaling.append({"batch": batch, "latency_ms": round(lat_ms, 2),
                        "captions_per_sec": round(batch / (lat_ms / 1e3), 1)})
        per_batch[batch] = lat_ms
    return scaling, per_batch


def _mode_result(name, gen_fn, params, data_sharding, batches,
                 flops_per_caption, peak, seed0):
    """Sweep + best-batch re-time for one secondary serving mode."""
    scaling, per_batch = _sweep(gen_fn, params, data_sharding, batches)
    best = max(per_batch, key=lambda b: b / per_batch[b])
    raw, prompt = _inputs(best, data_sharding)
    dts = sorted(_timed_window(gen_fn, params, raw, prompt, 10, seed0 + s)
                 for s in range(3))
    caps = best * 10 / dts[1]
    mfu = caps * flops_per_caption / peak
    assert mfu < 1.0, f"{name} MFU {mfu:.2f} >= 1: fence broken"
    return {
        f"{name}_captions_per_sec": round(caps, 2),
        f"{name}_batch": best,
        f"{name}_mfu": round(mfu, 4),
        f"{name}_batch_scaling": scaling,
    }


def main():
    from image2text_tpu.parallel.mesh import honor_platform_env

    honor_platform_env()

    # calibration gate: the pooled chip degrades in phases; wait up to
    # BENCH_WAIT_MIN (default 3) minutes for a window where a sustained
    # matmul runs healthy, then PROCEED EITHER WAY — the artifact records
    # calibration_healthy so a degraded-window number is flagged, not
    # silently withheld (round 3's unbounded 12-min gate starved the
    # driver timeout, BENCH_r03.json rc=124)
    calib0 = None
    calib_timeout = False
    if jax.devices()[0].platform == "tpu" and not SMOKE:
        _phase("calibration gate (single-compile probe, hard-capped)")
        deadline = time.time() + float(
            os.environ.get("BENCH_WAIT_MIN", "3")) * 60
        while True:
            calib0 = fast_calib()
            if calib0 is None:
                calib_timeout = True
                break
            if calib0 > 100 or time.time() > deadline:
                break
            print(f"# calib {calib0:.0f} TFLOP/s — degraded, waiting",
                  flush=True)
            time.sleep(20)

    _phase("build model + shardings")
    (cfg, params, build_params_w8, gen_fn, gen_int8, gen_approx, gen_all,
     dev, data_sharding) = _build()

    flops_analytic = analytic_flops_per_caption(cfg, MAX_NEW_TOKENS,
                                                PROMPT_LEN)

    # ---- exact-path batch sweep (two shapes by default: two compiles) ------
    batches = FULL_BATCHES if FULL else BATCHES
    scaling, per_batch = _sweep(gen_fn, params, data_sharding, batches)

    # pick the best-throughput batch as the headline number, re-timed longer
    _phase("headline re-time")
    best_batch = max(per_batch, key=lambda b: b / per_batch[b])
    raw, prompt = _inputs(best_batch, data_sharding)
    iters = 10
    dts = sorted(_timed_window(gen_fn, params, raw, prompt, iters, 10 + s)
                 for s in range(3))
    dt = dts[1]
    caps_per_sec = best_batch * iters / dt
    lat_ms = dt / iters * 1000.0

    # ---- FLOP accounting (XLA cost model on the exact compiled program) ----
    flops_xla = None
    try:
        lowered = gen_fn.lower(params, raw, prompt, jax.random.PRNGKey(0))
        ca = lowered.compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        if ca and "flops" in ca:
            flops_xla = float(ca["flops"]) / best_batch
    except Exception:
        pass
    # XLA's cost model cannot see inside pallas custom-calls (the fused
    # block/FFN kernels carry most of the encoder's FLOPs), so the XLA
    # count under-reports once kernels dispatch; take the max of the two
    # independent estimates — both remain in the JSON for auditing
    flops_per_caption = max(flops_xla or 0.0, flops_analytic)

    implied = caps_per_sec * flops_per_caption
    peak = chip_peak_flops(dev) * max(1, len(jax.devices()))
    mfu = implied / peak
    assert mfu < 1.0, (
        f"MFU {mfu:.2f} >= 1: implied {implied:.3e} FLOP/s exceeds the "
        f"chip's bf16 peak {peak:.3e} — the timing fence is broken; do not "
        f"publish this number")
    # latency must grow with batch once compute-bound: 4x batch within
    # measurement noise of flat means we timed dispatch, not execution
    lo, hi = batches[0], batches[-1]
    if not SMOKE and per_batch[hi] < 1.5 * per_batch[lo]:
        raise AssertionError(
            f"batch-{hi} latency ({per_batch[hi]:.2f} ms) is not "
            f">=1.5x batch-{lo} latency ({per_batch[lo]:.2f} ms): flat "
            f"scaling across {hi // lo}x compute means the window closed "
            f"on dispatch, not device execution")

    n_chips = max(1, len(jax.devices()))
    target = NORTH_STAR_V5E8 * n_chips / 8.0
    headline = {
        "metric": "captions_per_sec",
        "value": round(caps_per_sec, 2),
        "unit": "captions/s",
        "vs_baseline": round(caps_per_sec / target, 4),
        "decode_tokens_per_sec": round(caps_per_sec * MAX_NEW_TOKENS, 1),
        "batch_latency_ms": round(lat_ms, 2),
        "batch": best_batch,
        "max_new_tokens": MAX_NEW_TOKENS,
        "flops_per_caption": round(flops_per_caption),
        "flops_per_caption_analytic": round(flops_analytic),
        "flops_per_caption_xla": round(flops_xla) if flops_xla else None,
        "implied_flops_per_sec": round(implied),
        "chip_peak_bf16_flops": peak,
        "mfu": round(mfu, 4),
        "batch_scaling": scaling,
        "calibration_tflops_before": round(calib0, 1) if calib0 else calib0,
        "calibration_healthy": bool(calib0 > 100) if calib0 else None,
        "calibration_timeout": calib_timeout,
        "timing": "median-of-3 fenced windows (D2H-materialized, "
                  "data-dependency chained)",
        "device": str(dev.platform),
        "device_kind": getattr(dev, "device_kind", "?"),
        "n_devices": n_chips,
        "model": "tpu/nano-mini (12L enc + 12L dec, 1024d, MQA/MoE/sparse)",
    }

    if not FULL:
        _phase("done (exact path only; BENCH_FULL=1 for secondary modes)")
        print(json.dumps(headline))
        return

    # ---- BENCH_FULL=1: secondary serving modes -----------------------------
    # headline first: a truncated full run must still yield the gate number
    print(json.dumps(headline), flush=True)
    extras = {}

    # int8 cross-KV serving mode (secondary — the headline stays the
    # numerics-exact path): halves the decode loop's per-step re-read of
    # every layer's cross-attention K/V
    if _time_left() > 300:
        _phase("int8 cross-KV mode")
        try:
            extras.update(_mode_result(
                "int8_kv", gen_int8, params, data_sharding, batches,
                flops_per_caption, peak, 20))
        except Exception as e:
            extras["int8_kv_error"] = f"{type(e).__name__}: {str(e)[:200]}"
    else:
        extras["int8_kv_skipped"] = "budget"

    # full int8 serving (W8A8 decoder weights + int8 cross-KV): the weight
    # term is batch-independent, so one point shows the stacked saving
    if _time_left() > 240:
        _phase("W8A8 stacked mode")
        try:
            params_w8 = build_params_w8()
            ib = extras.get("int8_kv_batch", batches[0])
            raw_i, prompt_i = _inputs(ib, data_sharding)
            np.asarray(gen_int8(params_w8, raw_i, prompt_i,
                                jax.random.PRNGKey(0)))  # warm
            dts = sorted(_timed_window(gen_int8, params_w8, raw_i, prompt_i,
                                       10, 40 + s) for s in range(3))
            extras["int8_serving_captions_per_sec"] = round(
                ib * 10 / dts[1], 2)
            extras["int8_serving_batch"] = ib
            del params_w8  # free the extra decoder copy
        except Exception as e:
            extras["int8_serving_error"] = (
                f"{type(e).__name__}: {str(e)[:200]}")
    else:
        extras["int8_serving_skipped"] = "budget"

    # approx-top-k serving mode: sampler head pull via ApproxTopK
    # PartialReduce (recall 0.95; bans never dropped — see
    # sampling.sample_topk_with_ngram)
    if _time_left() > 300:
        _phase("approx-top-k mode")
        try:
            extras.update(_mode_result(
                "approx_topk", gen_approx, params, data_sharding, batches,
                flops_per_caption, peak, 60))
            # every serving mode stacked at the approx best batch
            if _time_left() > 240:
                _phase("all-modes-stacked")
                params_w8 = build_params_w8()
                ab = extras["approx_topk_batch"]
                raw_a, prompt_a = _inputs(ab, data_sharding)
                np.asarray(gen_all(params_w8, raw_a, prompt_a,
                                   jax.random.PRNGKey(0)))  # warm
                dts = sorted(_timed_window(gen_all, params_w8, raw_a,
                                           prompt_a, 10, 80 + s)
                             for s in range(3))
                extras["all_modes_captions_per_sec"] = round(
                    ab * 10 / dts[1], 2)
                extras["all_modes_batch"] = ab
                del params_w8
        except Exception as e:
            extras["approx_topk_error"] = (
                f"{type(e).__name__}: {str(e)[:200]}")
    else:
        extras["approx_topk_skipped"] = "budget"

    # beam-search serving number (fail-soft)
    if _time_left() > 240:
        _phase("beam search mode")
        try:
            extras.update(_bench_beam(cfg, params, dev, data_sharding,
                                      flops_analytic))
        except Exception as e:
            extras["beam_error"] = f"{type(e).__name__}: {str(e)[:200]}"
    else:
        extras["beam_skipped"] = "budget"

    calib1 = None
    if dev.platform == "tpu" and not SMOKE:
        calib1 = fast_calib()
    extras["calibration_tflops_after"] = (
        round(calib1, 1) if calib1 else calib1)

    _phase("done (full)")
    # final line: headline + extras merged, so the last JSON line of a
    # completed full run carries everything
    print(json.dumps({**extras, **headline}))


if __name__ == "__main__":
    main()
