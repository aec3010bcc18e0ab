"""XLA-vs-fused timing for the encoder front-end prelude at serving shape
(projector + 2x LayerNormND + pos-emb + CLS concat; see
ops/fused_frontend.py).  Slope-timed fori_loop chains, calibration
brackets.  Appends one JSON line to PROBE_FRONTEND.jsonl.

Usage: python tools/frontend_probe.py [batch]
"""
from __future__ import annotations

import json
import sys

import numpy as np

import jax

sys.path.insert(0, ".")

from image2text_tpu.utils.compile_cache import setup_compile_cache

setup_compile_cache("jaxcache-decode")
import jax.numpy as jnp

from bench_kernels import device_loop_ms, quick_calib
from __graft_entry__ import _flagship_config
from image2text_tpu.models.vision_encoder_decoder import VisionEncoderDecoder
from image2text_tpu.nn.core import EVAL_CTX
from image2text_tpu.ops.fused_frontend import fused_frontend_compatible


def main(batch=256):
    cfg = _flagship_config(tiny=False)
    model = VisionEncoderDecoder(cfg.model)
    p = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16)
        if jnp.issubdtype(a.dtype, jnp.floating) else a,
        model.init(jax.random.PRNGKey(0)))["encoder"]
    enc = model.encoder
    t = enc.n_patches ** 2
    x = 0.3 * jax.random.normal(jax.random.PRNGKey(1),
                                (batch, t, enc.input_d), jnp.bfloat16)

    def xla_prelude(p, x):
        z = enc.ln_input(p["ln_input"], enc.projector(p["projector"], x))
        wpe = enc.transformer._children["wpe"]
        pos = wpe(p["transformer"]["wpe"], jnp.arange(t))[None]
        y = z + pos.astype(z.dtype)
        cls = jnp.broadcast_to(p["cls_token"].astype(z.dtype),
                               (batch, enc.n_cls, enc.out_dim))
        return jnp.concatenate([cls, enc.ln_input(p["ln_input"], y)], axis=1)

    def body_xla(i, c):
        # chain the token rows back into the carry (padded to input_d) so
        # XLA cannot hoist the prelude out of the loop
        (xx,) = c
        o = xla_prelude(p, xx)
        return (xx * 0.9 + jnp.pad(o[:, enc.n_cls:],
                                   ((0, 0), (0, 0),
                                    (0, enc.input_d - enc.out_dim)))
                * jnp.asarray(0.1, xx.dtype),)

    def body_fused(i, c):
        (xx,) = c
        o = fused_frontend_compatible(enc, p, xx)
        return (xx * 0.9 + jnp.pad(o[:, enc.n_cls:],
                                   ((0, 0), (0, 0),
                                    (0, enc.input_d - enc.out_dim)))
                * jnp.asarray(0.1, xx.dtype),)

    out = {"batch": batch,
           "calib_before_tflops": round(quick_calib(), 1)}
    out["frontend_xla_ms"] = round(device_loop_ms(body_xla, (x,)), 4)
    out["frontend_fused_ms"] = round(device_loop_ms(body_fused, (x,)), 4)
    a = xla_prelude(p, x)
    b = fused_frontend_compatible(enc, p, x)
    out["fused_max_abs_err"] = round(float(jnp.max(jnp.abs(
        a.astype(jnp.float32) - b.astype(jnp.float32)))), 6)
    out["calib_after_tflops"] = round(quick_calib(), 1)
    out["device_kind"] = getattr(jax.devices()[0], "device_kind", "?")
    print(json.dumps(out), flush=True)
    with open("PROBE_FRONTEND.jsonl", "a") as f:
        f.write(json.dumps(out) + "\n")


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:]))
