"""XLA-vs-Pallas timing for the fused MoE FFN at serving shapes.

Shapes: the flagship encoder block's selected-token stream
(b256·t160 rows, d=1024, hidden 2048) and the decoder's per-step decode
rows (256 / 1024 rows, hidden 4096).  Slope-timed on-device fori_loops
(bench_kernels.device_loop_ms), calibration-bracketed.  Appends one JSON
line to PROBE_MOE.jsonl.

Usage: python tools/moe_probe.py
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
from image2text_tpu.configs.models import MoEConfig
from image2text_tpu.models.layers import _MoEMLP
from image2text_tpu.nn.core import EVAL_CTX
from image2text_tpu.nn.modules import gelu_tanh
from image2text_tpu.ops.fused_moe import fused_moe_mlp_compatible


def build(n_embd, ff_mult):
    cfg = MoEConfig(num_experts=4, proj_features=16, gate_sizes=[32],
                    ff_mult_factor=ff_mult, top_k=2)
    mlp = _MoEMLP(n_embd, False, 0.1, cfg)
    p = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16)
        if jnp.issubdtype(a.dtype, jnp.floating) else a,
        mlp.init(jax.random.PRNGKey(0)))
    return mlp, p


def xla_body(mlp, p, x):
    h = gelu_tanh(mlp.c_fc(p["c_fc"], x, ctx=EVAL_CTX))
    return mlp.c_proj(p["c_proj"], h, ctx=EVAL_CTX)


def main():
    out = {"calib_before_tflops": round(quick_calib(), 1)}
    for name, rows, ff in (("enc_b256", 256 * 160, 2.0),
                           ("dec_b256", 256, 4.0),
                           ("dec_b1024", 1024, 4.0)):
        mlp, p = build(1024, ff)
        x = jax.random.normal(jax.random.PRNGKey(1), (rows, 1024),
                              jnp.bfloat16)

        # residual-chained carry: iteration i+1 consumes EVERY element of
        # iteration i's output (no DCE slicing, no loop-invariant hoist)
        def body_x(i, c):
            (xx,) = c
            return (xx * 0.9 + xla_body(mlp, p, xx) * 0.1,)

        def body_p(i, c):
            (xx,) = c
            return (xx * 0.9 + fused_moe_mlp_compatible(mlp, p, xx) * 0.1,)

        out[f"{name}_xla_ms"] = round(device_loop_ms(body_x, (x,)), 4)
        out[f"{name}_pallas_ms"] = round(device_loop_ms(body_p, (x,)), 4)
    out["calib_after_tflops"] = round(quick_calib(), 1)
    out["device_kind"] = getattr(jax.devices()[0], "device_kind", "?")
    print(json.dumps(out), flush=True)
    with open("PROBE_MOE.jsonl", "a") as f:
        f.write(json.dumps(out) + "\n")


if __name__ == "__main__":
    main()
