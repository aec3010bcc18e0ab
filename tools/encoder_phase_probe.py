"""Sub-attribution of the encoder forward on the chip.

PROFILE_PHASES.json puts the flagship encoder at ~105 ms of the 226 ms
batch-256 caption latency (vs ~23 ms if its ~17 GFLOP/image ran at the
calibrated matmul rate).  This probe slope-times the encoder's internal
phases to find where the other ~80 ms go:

* ``conv``           — ConvMLP feature extractor (low-channel 'same'
                       convs at full 128x128 resolution: the classic
                       MXU-hostile shape)
* ``proj``           — patch projector + LayerNormND prelude
* ``blocks``         — the 12 sparse/MQA/MoE transformer blocks (flash)
* ``blocks_noflash`` — same blocks, use_flash=False (XLA SDPA) — a
                       decision-grade flash-vs-XLA point at the serving
                       encoder's own shape (b256, h8, s320/160 sparse)
* ``blocks_dense``   — a dense-attention (is_sparse_attn=False) variant
                       of the same dims: isolates the sparse gather/
                       scatter/null-path machinery cost

Methodology identical to tools/decode_slope.py (two fori_loop trip
counts, min-over-attempts, calibration brackets).  Appends one JSON line
to PROFILE_ENCODER.json.

Usage: python tools/encoder_phase_probe.py [batch]
"""
from __future__ import annotations

import copy
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
    from image2text_tpu.models.generation import EVAL
    from image2text_tpu.models.vision_encoder_decoder import VisionEncoderDecoder
    from image2text_tpu.ops.preprocess import resize_normalize_on_device

    cfg = _flagship_config(tiny=False)
    model = VisionEncoderDecoder(cfg.model)
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if jnp.issubdtype(x.dtype, jnp.floating) else x,
        model.init(jax.random.PRNGKey(0)))
    enc = model.encoder
    ep = params["encoder"]

    # dense-attention twin (same dims, no sparse machinery)
    dcfg = copy.deepcopy(cfg.model.vision_encoder_config)
    dcfg.transformer_config.is_sparse_attn = False
    denc = VisionEncoderDecoder.__new__(VisionEncoderDecoder)  # only need encoder
    from image2text_tpu.models.encoder import VisionTransformerEncoder

    dmod = VisionTransformerEncoder(dcfg)
    dp = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if jnp.issubdtype(x.dtype, jnp.floating) else x,
        dmod.init(jax.random.PRNGKey(1)))

    rng = np.random.default_rng(0)
    raw = jnp.asarray(rng.integers(0, 256, (batch, 160, 240, 3)), jnp.uint8)
    im_size = cfg.model.vision_encoder_config.input.width
    images = jax.jit(lambda r: resize_normalize_on_device(
        r, im_size, out_dtype=jnp.bfloat16))(raw)

    n_tok = enc.n_patches ** 2

    def prelude(p, images):
        x = enc.feature_extractor(p["feature_extractor"], images, ctx=EVAL)
        x = x.reshape(batch, n_tok, enc.input_d)
        x = enc.ln_input(p["ln_input"], enc.projector(p["projector"], x))
        wpe = enc.transformer._children["wpe"]
        pos_emb = wpe(p["transformer"]["wpe"], jnp.arange(n_tok))[None]
        y = x + pos_emb.astype(x.dtype)
        cls = jnp.broadcast_to(p["cls_token"].astype(x.dtype),
                               (batch, enc.n_cls, enc.out_dim))
        return jnp.concatenate([cls, enc.ln_input(p["ln_input"], y)], axis=1)

    x0 = jax.jit(prelude)(ep, images)
    conv_out = jax.jit(lambda p, im: enc.feature_extractor(
        p["feature_extractor"], im, ctx=EVAL))(ep, images)

    def conv_loop(n):
        def fn(p, images):
            def body(i, carry):
                images, acc = carry
                out = enc.feature_extractor(p["feature_extractor"], images,
                                            ctx=EVAL)
                acc = out.mean().astype(images.dtype)
                return images + acc * jnp.asarray(1e-8, images.dtype), acc
            _, acc = jax.lax.fori_loop(
                0, n, body, (images, jnp.zeros((), images.dtype)))
            return acc
        return jax.jit(fn)

    def proj_loop(n):
        def fn(p, conv_out):
            def body(i, carry):
                c, acc = carry
                x = c.reshape(batch, n_tok, enc.input_d)
                x = enc.ln_input(p["ln_input"], enc.projector(p["projector"], x))
                acc = x.mean().astype(c.dtype)
                return c + acc * jnp.asarray(1e-8, c.dtype), acc
            _, acc = jax.lax.fori_loop(
                0, n, body, (conv_out, jnp.zeros((), conv_out.dtype)))
            return acc
        return jax.jit(fn)

    def blocks_loop(n, module, mp, use_flash, lazy=False):
        blocks = module.blocks

        def fn(p, x0):
            def body(i, carry):
                x0, acc = carry
                x = x0
                layout = None
                for depth, blk in enumerate(blocks):
                    bp = p["transformer"]["h"][str(depth)]
                    if lazy:  # the encoder.forward path (lazy layouts)
                        new_layout = blk.next_layout(layout, x.shape[1])
                        x = blk(bp, x, ctx=EVAL, use_flash=use_flash,
                                layout=layout, want_lazy=True)[0]
                        layout = new_layout
                    else:
                        x = blk(bp, x, ctx=EVAL, use_flash=use_flash)
                acc = x.mean().astype(x0.dtype)
                return x0 + acc * jnp.asarray(1e-8, x0.dtype), acc
            _, acc = jax.lax.fori_loop(
                0, n, body, (x0, jnp.zeros((), x0.dtype)))
            return acc
        return jax.jit(fn)

    variants = {
        "conv": (conv_loop(LO), conv_loop(HI), (ep, images)),
        "proj": (proj_loop(LO), proj_loop(HI), (ep, conv_out)),
        "blocks": (blocks_loop(LO, enc, ep, True),
                   blocks_loop(HI, enc, ep, True), (ep, x0)),
        "blocks_noflash": (blocks_loop(LO, enc, ep, False),
                           blocks_loop(HI, enc, ep, False), (ep, x0)),
        "blocks_lazy": (blocks_loop(LO, enc, ep, False, lazy=True),
                        blocks_loop(HI, enc, ep, False, lazy=True), (ep, x0)),
        "blocks_dense": (blocks_loop(LO, dmod, dp, True),
                         blocks_loop(HI, dmod, dp, True), (dp, x0)),
    }

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
                                 and out["blocks_ms"]
                                 < best.get("blocks_ms", 1e9))):
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
    with open("PROFILE_ENCODER.json", "a") as f:
        f.write(json.dumps(out) + "\n")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 256)
