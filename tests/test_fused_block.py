"""Fused sparse-block Pallas kernel vs the XLA block composition.

The kernel (ops/fused_block.py) must reproduce the eval TransformerBlock
residual chain — LayerNorm(f32 stats) → MQA with storage-dtype score
materialisation → LayerNorm → MoE FFN — to accumulation-order rounding.
Interpret mode on CPU.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from image2text_tpu.configs.models import (MoEConfig, SelfAttentionConfig,
                                           SelfAttentionType,
                                           TransformerConfig)
from image2text_tpu.models.layers import TransformerBlock
from image2text_tpu.nn.core import Ctx
from image2text_tpu.ops.fused_block import fused_block_compatible


def _mk(bias):
    cfg = TransformerConfig(
        is_causal=False, is_cross_attn=False, is_sparse_attn=False,
        attn_config=SelfAttentionConfig(
            attn_dropout=0.1, bias=bias, dropout=0.1, n_head=2, n_embd=256,
            attn_type=SelfAttentionType.MULTI_QUERY),
        rotator_config=MoEConfig(num_experts=4, proj_features=16,
                                 gate_sizes=[32], ff_mult_factor=2.0,
                                 top_k=2))
    blk = TransformerBlock(cfg, seed=None, n_cls=0)
    params = blk.init(jax.random.PRNGKey(0))
    return blk, params


@pytest.mark.parametrize("bias", [True, False])
def test_fused_block_matches_xla(bias):
    blk, params = _mk(bias)
    x = 0.3 * jax.random.normal(jax.random.PRNGKey(1), (8, 16, 256),
                                jnp.float32)
    ref = blk(params, x, ctx=Ctx(train=False), use_flash=False)
    out = fused_block_compatible(blk, params, x, interpret=True)
    assert out is not None
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=3e-5, atol=3e-5)


def test_fused_block_bf16_close():
    blk, params = _mk(False)
    params = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16)
        if jnp.issubdtype(a.dtype, jnp.floating) else a, params)
    x = 0.3 * jax.random.normal(jax.random.PRNGKey(2), (4, 16, 256),
                                jnp.bfloat16)
    ref = blk(params, x, ctx=Ctx(train=False), use_flash=False)
    out = fused_block_compatible(blk, params, x, interpret=True)
    assert out is not None
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=0.06, atol=0.06)


def test_dispatch_declines_out_of_scope():
    blk, params = _mk(False)
    x = jnp.zeros((8, 16, 256), jnp.float16)
    assert fused_block_compatible(blk, params, x, interpret=True) is None
    # sublane-ragged sequence length
    x = jnp.zeros((8, 13, 256), jnp.float32)
    assert fused_block_compatible(blk, params, x, interpret=True) is None


# -- round-5: v2 kernel — sparse machinery folded in -------------------------

def _mk_sparse(bias):
    cfg = TransformerConfig(
        is_causal=False, is_cross_attn=False, is_sparse_attn=True,
        max_block_size=32, sparsity_factor=0.5,
        attn_config=SelfAttentionConfig(
            attn_dropout=0.1, bias=bias, dropout=0.1, n_head=2, n_embd=256,
            attn_type=SelfAttentionType.MULTI_QUERY),
        rotator_config=MoEConfig(num_experts=4, proj_features=16,
                                 gate_sizes=[32], ff_mult_factor=2.0,
                                 top_k=2))
    blk = TransformerBlock(cfg, seed=3, n_cls=4)
    params = blk.init(jax.random.PRNGKey(0))
    return blk, params


@pytest.mark.parametrize("bias", [True, False])
def test_fused_sparse_block_matches_lazy_xla(bias):
    """v2 kernel (gather + chain + null bypass + concat in one pallas_call)
    == the XLA lazy sparse path, for canonical AND permuted layouts."""
    from image2text_tpu.ops.fused_block import fused_sparse_block_compatible

    blk, params = _mk_sparse(bias)
    rng = np.random.default_rng(1)
    x = jnp.asarray(0.3 * rng.standard_normal((4, 32, 256)), jnp.float32)
    for layout in (None, np.random.default_rng(2).permutation(32)):
        ref, ref_layout = blk(params, x, ctx=Ctx(train=False),
                              use_flash=False, layout=layout, want_lazy=True)
        out = fused_sparse_block_compatible(blk, params, x, layout,
                                            interpret=True)
        assert out is not None
        np.testing.assert_array_equal(
            ref_layout,
            np.concatenate([blk.idx_np, blk.not_idx_np]))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=3e-5, atol=3e-5,
                                   err_msg=f"layout={layout is not None}")


def test_fused_sparse_block_bf16_and_decline():
    from image2text_tpu.ops.fused_block import fused_sparse_block_compatible

    blk, params = _mk_sparse(False)
    params = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16)
        if jnp.issubdtype(a.dtype, jnp.floating) else a, params)
    rng = np.random.default_rng(3)
    x = jnp.asarray(0.3 * rng.standard_normal((2, 32, 256)), jnp.bfloat16)
    ref = blk(params, x, ctx=Ctx(train=False), use_flash=False,
              want_lazy=True, layout=None)[0]
    out = fused_sparse_block_compatible(blk, params, x, None, interpret=True)
    assert out is not None
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=0.06, atol=0.06)
    # dense block declines; fp16 declines
    dblk, dparams = _mk(False)
    xd = jnp.zeros((4, 16, 256), jnp.float32)
    assert fused_sparse_block_compatible(dblk, dparams, xd, None,
                                         interpret=True) is None
    assert fused_sparse_block_compatible(blk, params,
                                         x.astype(jnp.float16), None,
                                         interpret=True) is None


# -- round-5: fused encoder front-end ---------------------------------------

@pytest.mark.parametrize("dtype", ["float32", "bfloat16"])
def test_fused_frontend_matches_xla(dtype):
    """Kernel == projector -> LN-ND -> +pos -> LN-ND -> [CLS; tokens]."""
    from image2text_tpu.configs.models import (ImageInputSpec,
                                               VisionTransformerEncoderConfig)
    from image2text_tpu.models.encoder import VisionTransformerEncoder
    from image2text_tpu.ops.fused_frontend import fused_frontend_compatible

    cfg = VisionTransformerEncoderConfig(
        transformer_config=TransformerConfig(
            rotator_config=MoEConfig(num_experts=2, proj_features=8,
                                     gate_sizes=[16], ff_mult_factor=2.0,
                                     top_k=1),
            attn_config=SelfAttentionConfig(
                attn_type=SelfAttentionType.MULTI_QUERY, n_embd=128,
                n_head=1, bias=False),
            is_causal=False, is_cross_attn=False),
        input=ImageInputSpec(n_channels=3, width=32, height=32),
        n_layer=1, n_cls=8, num_patches=4, n_channels=2)
    enc = VisionTransformerEncoder(cfg)
    params = enc.init(jax.random.PRNGKey(0))
    dt = jnp.dtype(dtype)
    params = jax.tree_util.tree_map(
        lambda a: a.astype(dt)
        if jnp.issubdtype(a.dtype, jnp.floating) else a, params)
    rng = np.random.default_rng(0)
    x = jnp.asarray(0.5 * rng.standard_normal((4, 16, enc.input_d)), dt)

    # module-composed reference prelude
    z = enc.ln_input(params["ln_input"],
                     enc.projector(params["projector"], x))
    wpe = enc.transformer._children["wpe"]
    pos = wpe(params["transformer"]["wpe"], jnp.arange(16))[None]
    y = z + pos.astype(z.dtype)
    cls = jnp.broadcast_to(params["cls_token"].astype(z.dtype), (4, 8, 128))
    ref = jnp.concatenate([cls, enc.ln_input(params["ln_input"], y)], axis=1)

    out = fused_frontend_compatible(enc, params, x, interpret=True)
    assert out is not None and out.shape == (4, 24, 128)
    tol = 3e-5 if dtype == "float32" else 0.05
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=tol, atol=tol)
    # fp16 declines
    assert fused_frontend_compatible(enc, params,
                                     x.astype(jnp.float16),
                                     interpret=True) is None
