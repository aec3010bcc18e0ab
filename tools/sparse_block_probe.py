"""Full sparse-block timing at serving shape: XLA lazy machinery vs the
v1 kernel (chain fused, gathers/null/concat in XLA) vs the v2 kernel
(everything in one pallas_call).

Times ONE flagship encoder TransformerBlock on the full 320-row stream
(b, t=320, d=1024, n_cls=64, sparsity 0.5 → t_sel=160) through the lazy
want_lazy path — what the encoder loop actually runs per depth.  The
round-4 numbers put the v1 kernel at 3.05 ms plus ~2 ms of XLA-side
select/null/concat per block at batch 256 (PROBE_BLOCK.jsonl,
PROFILE_ENC_BLOCK.json); v2 folds that machinery into the kernel.

Appends one JSON line to PROBE_SPARSE_BLOCK.jsonl.

Usage: python tools/sparse_block_probe.py [batch]
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
from image2text_tpu.configs.models import (MoEConfig, SelfAttentionConfig,
                                           SelfAttentionType,
                                           TransformerConfig)
from image2text_tpu.models.layers import TransformerBlock
from image2text_tpu.nn.core import EVAL_CTX
from image2text_tpu.ops import fused_block as fb


def main(batch=256):
    cfg = TransformerConfig(
        is_causal=False, is_cross_attn=False, is_sparse_attn=True,
        max_block_size=320, sparsity_factor=0.5,
        attn_config=SelfAttentionConfig(
            attn_dropout=0.1, bias=False, dropout=0.1, n_head=8,
            n_embd=1024, attn_type=SelfAttentionType.MULTI_QUERY),
        rotator_config=MoEConfig(num_experts=4, proj_features=16,
                                 gate_sizes=[32], ff_mult_factor=2.0,
                                 top_k=2))
    blk = TransformerBlock(cfg, seed=0, n_cls=64)
    p = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16)
        if jnp.issubdtype(a.dtype, jnp.floating) else a,
        blk.init(jax.random.PRNGKey(0)))
    x = 0.3 * jax.random.normal(jax.random.PRNGKey(1),
                                (batch, 320, 1024), jnp.bfloat16)
    t_sel = int(blk.idx_np.shape[0])

    def lazy_step(xx, use_flash):
        out, _ = blk(p, xx, ctx=EVAL_CTX, use_flash=use_flash,
                     layout=None, want_lazy=True)
        return out

    def body_xla(i, c):
        (xx,) = c
        return (xx * 0.9 + lazy_step(xx, False) * 0.1,)

    real_sparse = fb.fused_sparse_block_compatible

    def body_v1(i, c):
        # v2 dispatch declined → v1 kernel + XLA gathers/null/concat
        fb.fused_sparse_block_compatible = lambda *a, **k: None
        try:
            (xx,) = c
            return (xx * 0.9 + lazy_step(xx, True) * 0.1,)
        finally:
            fb.fused_sparse_block_compatible = real_sparse

    def body_v2(i, c):
        (xx,) = c
        return (xx * 0.9 + lazy_step(xx, True) * 0.1,)

    out = {"batch": batch, "t_sel": t_sel,
           "calib_before_tflops": round(quick_calib(), 1)}
    out["lazy_xla_ms"] = round(device_loop_ms(body_xla, (x,)), 4)
    out["lazy_v1_ms"] = round(device_loop_ms(body_v1, (x,)), 4)
    import os
    for cap in (2, 4):
        os.environ["GRAFT_SPARSE_BTILE"] = str(cap)
        try:
            out[f"lazy_v2_bt{cap}_ms"] = round(
                device_loop_ms(body_v2, (x,)), 4)
        except Exception as exc:  # VMEM overflow at the bigger tile
            out[f"lazy_v2_bt{cap}_ms"] = None
            out[f"lazy_v2_bt{cap}_err"] = str(exc)[-200:]
    os.environ.pop("GRAFT_SPARSE_BTILE", None)
    # on-chip numerics: v2 vs the XLA lazy path
    a = lazy_step(x, False)
    b = lazy_step(x, True)
    err = float(jnp.max(jnp.abs(a.astype(jnp.float32)
                                - b.astype(jnp.float32))))
    out["v2_max_abs_err"] = round(err, 6)
    out["calib_after_tflops"] = round(quick_calib(), 1)
    out["device_kind"] = getattr(jax.devices()[0], "device_kind", "?")
    print(json.dumps(out), flush=True)
    with open("PROBE_SPARSE_BLOCK.jsonl", "a") as f:
        f.write(json.dumps(out) + "\n")


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:]))
