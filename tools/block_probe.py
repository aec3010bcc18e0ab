"""XLA-vs-fused-kernel timing for the encoder sparse block at serving shape.

Times one flagship encoder TransformerBlock (d=1024, MQA 8 heads, MoE FFN)
on the selected-token stream (b=256, t_sel=160) — the XLA composition vs
the ops/fused_block.py Pallas kernel.  Slope-timed on-device fori_loops,
calibration-bracketed.  Appends one JSON line to PROBE_BLOCK.jsonl.

Usage: python tools/block_probe.py [batch]
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
from image2text_tpu.configs.models import (MoEConfig, SelfAttentionConfig,
                                           SelfAttentionType,
                                           TransformerConfig)
from image2text_tpu.models.layers import TransformerBlock
from image2text_tpu.nn.core import EVAL_CTX
from image2text_tpu.ops.fused_block import fused_block_compatible


def main(batch=256, t_sel=160):
    cfg = TransformerConfig(
        is_causal=False, is_cross_attn=False, is_sparse_attn=False,
        attn_config=SelfAttentionConfig(
            attn_dropout=0.1, bias=False, dropout=0.1, n_head=8,
            n_embd=1024, attn_type=SelfAttentionType.MULTI_QUERY),
        rotator_config=MoEConfig(num_experts=4, proj_features=16,
                                 gate_sizes=[32], ff_mult_factor=2.0,
                                 top_k=2))
    blk = TransformerBlock(cfg, seed=None, n_cls=0)
    p = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16)
        if jnp.issubdtype(a.dtype, jnp.floating) else a,
        blk.init(jax.random.PRNGKey(0)))
    x = 0.3 * jax.random.normal(jax.random.PRNGKey(1),
                                (batch, t_sel, 1024), jnp.bfloat16)

    def body_x(i, c):
        (xx,) = c
        # use_flash=False forces the pure XLA composition (kernel escape
        # hatch); 0.9/0.1 residual chaining bounds magnitude
        return (xx * 0.9 + blk(p, xx, ctx=EVAL_CTX, use_flash=False) * 0.1,)

    def body_f(i, c):
        (xx,) = c
        return (xx * 0.9 + fused_block_compatible(blk, p, xx) * 0.1,)

    out = {"batch": batch, "t_sel": t_sel,
           "calib_before_tflops": round(quick_calib(), 1)}
    out["block_xla_ms"] = round(device_loop_ms(body_x, (x,)), 4)
    out["block_fused_ms"] = round(device_loop_ms(body_f, (x,)), 4)
    # on-chip numerics check (bf16): same inputs through both paths
    a = blk(p, x, ctx=EVAL_CTX, use_flash=False)
    b = fused_block_compatible(blk, p, x)
    err = float(jnp.max(jnp.abs(a.astype(jnp.float32)
                                - b.astype(jnp.float32))))
    out["fused_max_abs_err"] = round(err, 6)
    out["calib_after_tflops"] = round(quick_calib(), 1)
    out["device_kind"] = getattr(jax.devices()[0], "device_kind", "?")
    print(json.dumps(out), flush=True)
    with open("PROBE_BLOCK.jsonl", "a") as f:
        f.write(json.dumps(out) + "\n")


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:]))
