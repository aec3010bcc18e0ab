"""Benchmark: end-to-end caption generation throughput on the local device.

Prints ONE JSON line:
    {"metric": "captions_per_sec", "value": N, "unit": "captions/s",
     "vs_baseline": N, "mfu": ..., "flops_per_caption": ...,
     "batch_scaling": [...], ...}

The reference publishes no numbers (BASELINE.md); ``vs_baseline`` is
measured against the driver's north-star target of 5,000 Flickr30K
captions/sec on a v5e-8 (BASELINE.json), scaled to the number of available
chips — i.e. the single-chip target is 5000/8 captions/sec.

Methodology (round-2 rework — every claim must be physically verifiable):

* **FLOP accounting.** Per-call FLOPs come from XLA's own cost model
  (``compiled.cost_analysis()['flops']``) on the exact compiled program,
  cross-checked against an analytic matmul-term estimate of the same
  architecture (``analytic_flops_per_caption``).  The JSON emits
  ``flops_per_caption``, ``implied_flops_per_sec`` and ``mfu`` against the
  chip's bf16 peak — an MFU ≥ 1.0 would mean the timing is broken, and the
  script fails loudly rather than print it.
* **Fenced timing.** Each timed window chains a data dependency through
  every iteration (iteration i+1's prompt is sliced from iteration i's
  output) and ends with ``np.asarray(out)`` — a device→host copy of the
  result bytes — so the window cannot close before the device finished
  *computing* (``block_until_ready`` alone proved unreliable through the
  axon tunnel: round-1 recorded flat latency across an 8× batch sweep,
  i.e. it fenced dispatch, not execution).
* **Batch scaling table.** Latency is reported for batch 128→1024; once
  compute-bound it must grow with batch.  Median-of-windows, not min.

The benched pipeline is the real serving path: raw uint8 frames →
on-device fused preprocessing → encoder → KV-cached batched sampling
(top-k, temperature, no-repeat-ngram) on the ``tpu/nano-mini.yaml``
flagship architecture with randomly initialised weights (quality is
benchmarked by training runs, not here).
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
BATCHES = (8, 16) if SMOKE else (128, 256, 512, 1024)

# bf16 peak FLOP/s per chip (shared table; importable without this
# module's compile-cache side effects)
from image2text_tpu.utils.device import chip_peak_bf16_flops as chip_peak_flops  # noqa: E402,E501


def analytic_flops_per_caption(cfg, max_new_tokens: int,
                               prompt_len: int) -> float:
    """Matmul-term FLOP estimate (2·m·k·n) for one caption through the
    flagship serving path: encoder forward + cached prefill + per-token
    decode.  Elementwise/softmax terms are ignored (<2% of total).

    Cross-checks the XLA cost model; the two must agree within ~2×.
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
        fl += 2.0 * h * w * ks * cin * cout  # 'same' conv keeps H×W
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
    32 new tokens.  Per-caption FLOPs ≈ beam_width × the sampling path's
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
    batch = 8 if SMOKE else 64  # beams multiply memory/computation 3×
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


def main():
    from image2text_tpu.parallel.mesh import honor_platform_env

    honor_platform_env()

    # calibration gate (same policy as bench_kernels/bench_train): the
    # pooled chip degrades in phases; wait up to BENCH_WAIT_MIN for a
    # window where a sustained matmul runs healthy before measuring, and
    # record before/after calibration so the artifact is self-auditing
    calib0 = None
    if jax.devices()[0].platform == "tpu" and not SMOKE:
        from bench_kernels import quick_calib
        deadline = time.time() + float(
            os.environ.get("BENCH_WAIT_MIN", "12")) * 60
        while True:
            calib0 = quick_calib()
            if calib0 > 100 or time.time() > deadline:
                break
            print(f"# calib {calib0:.0f} TFLOP/s — degraded, waiting",
                  flush=True)
            time.sleep(30)

    (cfg, params, build_params_w8, gen_fn, gen_int8, gen_approx, gen_all,
     dev, data_sharding) = _build()

    flops_analytic = analytic_flops_per_caption(cfg, MAX_NEW_TOKENS,
                                                PROMPT_LEN)

    # ---- batch scaling table (also warms up every shape) -------------------
    scaling = []
    per_batch = {}
    for batch in BATCHES:
        raw, prompt = _inputs(batch, data_sharding)
        np.asarray(gen_fn(params, raw, prompt, jax.random.PRNGKey(0)))  # warm
        iters = 4
        dts = sorted(_timed_window(gen_fn, params, raw, prompt, iters, s)
                     for s in range(3))
        lat_ms = dts[1] / iters * 1000.0  # median window
        scaling.append({"batch": batch, "latency_ms": round(lat_ms, 2),
                        "captions_per_sec": round(batch / (lat_ms / 1e3), 1)})
        per_batch[batch] = lat_ms

    # pick the best-throughput batch as the headline number, re-timed longer
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
    flops_per_caption = flops_xla if flops_xla else flops_analytic

    implied = caps_per_sec * flops_per_caption
    peak = chip_peak_flops(dev) * max(1, len(jax.devices()))
    mfu = implied / peak
    assert mfu < 1.0, (
        f"MFU {mfu:.2f} >= 1: implied {implied:.3e} FLOP/s exceeds the "
        f"chip's bf16 peak {peak:.3e} — the timing fence is broken; do not "
        f"publish this number")
    # latency must grow with batch once compute-bound: 8x batch within
    # measurement noise of flat means we timed dispatch, not execution
    lo, hi = BATCHES[0], BATCHES[-1]
    if not SMOKE and per_batch[hi] < 1.5 * per_batch[lo]:
        raise AssertionError(
            f"batch-{hi} latency ({per_batch[hi]:.2f} ms) is not "
            f">=1.5x batch-{lo} latency ({per_batch[lo]:.2f} ms): flat "
            f"scaling across {hi // lo}x compute means the window closed "
            f"on dispatch, not device execution")

    # int8 cross-KV serving mode (secondary number — the headline stays the
    # numerics-exact path): halves the decode loop's dominant HBM term (the
    # per-step re-read of every layer's cross-attention K/V) and shrinks
    # large-batch footprints so the big-batch regime fits HBM
    int8_res = {}
    try:
        i_scaling = []
        i_per_batch = {}
        for batch in BATCHES:
            raw_i, prompt_i = _inputs(batch, data_sharding)
            np.asarray(gen_int8(params, raw_i, prompt_i,
                                jax.random.PRNGKey(0)))  # warm
            dts = sorted(_timed_window(gen_int8, params, raw_i, prompt_i, 4, s)
                         for s in range(3))
            lat = dts[1] / 4 * 1000.0
            i_scaling.append({"batch": batch, "latency_ms": round(lat, 2),
                              "captions_per_sec": round(batch / (lat / 1e3), 1)})
            i_per_batch[batch] = lat
        ib = max(i_per_batch, key=lambda b: b / i_per_batch[b])
        raw_i, prompt_i = _inputs(ib, data_sharding)
        dts = sorted(_timed_window(gen_int8, params, raw_i, prompt_i, 10,
                                   20 + s) for s in range(3))
        i_caps = ib * 10 / dts[1]
        i_mfu = i_caps * flops_per_caption / peak
        assert i_mfu < 1.0, f"int8 MFU {i_mfu:.2f} >= 1: fence broken"
        int8_res = {
            "int8_kv_captions_per_sec": round(i_caps, 2),
            "int8_kv_batch": ib,
            "int8_kv_mfu": round(i_mfu, 4),
            "int8_kv_batch_scaling": i_scaling,
        }

    except Exception as e:
        int8_res = {"int8_kv_error": f"{type(e).__name__}: {str(e)[:200]}"}

    # full int8 serving (W8A8 decoder weights + int8 cross-KV) at the best
    # int8 batch: the weight term is batch-independent, so one point
    # suffices to show the stacked saving (fail-soft: int8_kv numbers
    # survive a W8A8-path failure)
    try:
        params_w8 = build_params_w8()
        ib = int8_res.get("int8_kv_batch", BATCHES[0])
        raw_i, prompt_i = _inputs(ib, data_sharding)
        np.asarray(gen_int8(params_w8, raw_i, prompt_i,
                            jax.random.PRNGKey(0)))  # warm
        dts = sorted(_timed_window(gen_int8, params_w8, raw_i, prompt_i, 10,
                                   40 + s) for s in range(3))
        w_caps = ib * 10 / dts[1]
        int8_res.update({
            "int8_serving_captions_per_sec": round(w_caps, 2),
            "int8_serving_batch": ib,
        })
        del params_w8  # free the extra decoder copy before the beam bench
    except Exception as e:
        int8_res["int8_serving_error"] = f"{type(e).__name__}: {str(e)[:200]}"

    # approx-top-k serving mode (secondary number — the headline stays the
    # numerics-exact pipeline): the sampler's head pull via ApproxTopK
    # PartialReduce (recall 0.95; bans never dropped — see
    # sampling.sample_topk_with_ngram), measured 12× cheaper than the
    # exact sort at serving batch (PROBE_TOPK.jsonl)
    approx_res = {}
    try:
        a_scaling = []
        a_per_batch = {}
        for batch in BATCHES:
            raw_a, prompt_a = _inputs(batch, data_sharding)
            np.asarray(gen_approx(params, raw_a, prompt_a,
                                  jax.random.PRNGKey(0)))  # warm
            dts = sorted(_timed_window(gen_approx, params, raw_a, prompt_a,
                                       4, s) for s in range(3))
            lat = dts[1] / 4 * 1000.0
            a_scaling.append({"batch": batch, "latency_ms": round(lat, 2),
                              "captions_per_sec": round(batch / (lat / 1e3), 1)})
            a_per_batch[batch] = lat
        ab = max(a_per_batch, key=lambda b: b / a_per_batch[b])
        raw_a, prompt_a = _inputs(ab, data_sharding)
        dts = sorted(_timed_window(gen_approx, params, raw_a, prompt_a, 10,
                                   60 + s) for s in range(3))
        a_caps = ab * 10 / dts[1]
        a_mfu = a_caps * flops_per_caption / peak
        assert a_mfu < 1.0, f"approx MFU {a_mfu:.2f} >= 1: fence broken"
        approx_res = {
            "approx_topk_captions_per_sec": round(a_caps, 2),
            "approx_topk_batch": ab,
            "approx_topk_mfu": round(a_mfu, 4),
            "approx_topk_batch_scaling": a_scaling,
        }
        # every serving mode stacked (approx top-k + int8 cross-KV + W8A8
        # weights) at the approx best batch — the max-throughput config
        params_w8 = build_params_w8()
        np.asarray(gen_all(params_w8, raw_a, prompt_a,
                           jax.random.PRNGKey(0)))  # warm
        dts = sorted(_timed_window(gen_all, params_w8, raw_a, prompt_a, 10,
                                   80 + s) for s in range(3))
        approx_res["all_modes_captions_per_sec"] = round(ab * 10 / dts[1], 2)
        approx_res["all_modes_batch"] = ab
        del params_w8
    except Exception as e:
        approx_res["approx_topk_error"] = f"{type(e).__name__}: {str(e)[:200]}"

    # beam-search serving number (fail-soft: the sampling headline must
    # survive a beam-path failure)
    try:
        beam = _bench_beam(cfg, params, dev, data_sharding, flops_analytic)
    except Exception as e:
        beam = {"beam_error": f"{type(e).__name__}: {str(e)[:200]}"}

    calib1 = None
    if dev.platform == "tpu" and not SMOKE:
        from bench_kernels import quick_calib
        calib1 = quick_calib()

    n_chips = max(1, len(jax.devices()))
    target = NORTH_STAR_V5E8 * n_chips / 8.0
    print(json.dumps({
        **beam,
        **int8_res,
        **approx_res,
        "calibration_tflops_before": round(calib0, 1) if calib0 else calib0,
        "calibration_tflops_after": round(calib1, 1) if calib1 else calib1,
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
        "timing": "median-of-3 fenced windows (D2H-materialized, "
                  "data-dependency chained)",
        "device": str(dev.platform),
        "device_kind": getattr(dev, "device_kind", "?"),
        "n_devices": n_chips,
        "model": "tpu/nano-mini (12L enc + 12L dec, 1024d, MQA/MoE/sparse)",
    }))


if __name__ == "__main__":
    main()
