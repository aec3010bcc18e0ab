"""Beam search with the int8 cross-KV serving mode, fenced.

Beams tile the encoder memory beam_width×, so the per-step cross-K/V
re-read — the decode loop's dominant HBM term — scales with bw and the
int8 mode's 2× byte cut matters MOST here.  With the round-5 mixed-dot
int8 form now winning end-to-end on the sampling path (BENCH_QUEUE_r05),
this probe measures the beam analog: same bw3/bef4/temp0.7/topk16
protocol as bench.py's exact-KV beam row (964 captions/s).

Appends one JSON line to PROBE_BEAM_INT8.jsonl.

Usage: python tools/beam_int8_probe.py
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np

import jax

sys.path.insert(0, ".")

from image2text_tpu.utils.compile_cache import setup_compile_cache

setup_compile_cache()
import jax.numpy as jnp

from __graft_entry__ import _flagship_config
from image2text_tpu.models.generation_utils import BeamSearchTokenGenerator
from image2text_tpu.models.vision_encoder_decoder import VisionEncoderDecoder
from image2text_tpu.ops.preprocess import resize_normalize_on_device
from image2text_tpu.utils.device import chip_peak_bf16_flops


def main():
    cfg = _flagship_config(tiny=False)
    model = VisionEncoderDecoder(cfg.model)
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if jnp.issubdtype(x.dtype, jnp.floating) else x,
        model.init(jax.random.PRNGKey(0)))
    im_size = cfg.model.vision_encoder_config.input.width
    out = {"beam_width": 3, "beam_expansion_factor": 4, "batch": 64,
           "max_new_tokens": 32}
    rows = {}
    for mode, quant in (("exact_kv", None), ("int8_kv", "int8")):
        gen = BeamSearchTokenGenerator(
            model, beam_width=3, beam_expansion_factor=4,
            temperature=0.7, top_k=16, max_new_tokens=32, eos_token_id=0,
            no_repeat_n_grams=tuple(cfg.model.no_repeat_n_grams),
            cross_kv_quant=quant)

        def beam_fn(params, raw, prompt, rng):
            images = resize_normalize_on_device(raw, im_size,
                                                out_dtype=jnp.bfloat16)
            ids, _ = gen(params, images, prompt, rng=rng)
            return ids

        beam_j = jax.jit(beam_fn)
        rng0 = np.random.default_rng(0)
        raw = jnp.asarray(rng0.integers(0, 256, (64, 160, 240, 3)),
                          jnp.uint8)
        prompt = jnp.ones((64, 1), jnp.int32)
        np.asarray(beam_j(params, raw, prompt, jax.random.PRNGKey(0)))
        iters = 4
        dts = []
        for s in range(3):
            t0 = time.perf_counter()
            o = None
            for i in range(iters):
                o = beam_j(params, raw, prompt,
                           jax.random.PRNGKey(100 + s * iters + i))
            np.asarray(o)  # D2H fence
            dts.append(time.perf_counter() - t0)
        caps = 64 * iters / sorted(dts)[1]
        rows[mode] = round(caps, 2)
    out["beam_captions_per_sec_exact_kv"] = rows["exact_kv"]
    out["beam_captions_per_sec_int8_kv"] = rows["int8_kv"]
    flops = 3 * 23976699904
    out["beam_int8_mfu"] = round(
        rows["int8_kv"] * flops / chip_peak_bf16_flops(jax.devices()[0]), 4)
    out["device_kind"] = getattr(jax.devices()[0], "device_kind", "?")
    print(json.dumps(out), flush=True)
    with open("PROBE_BEAM_INT8.jsonl", "a") as f:
        f.write(json.dumps(out) + "\n")


if __name__ == "__main__":
    main()
