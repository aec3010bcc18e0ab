"""End-to-end composite-model tests, mirroring the reference's unit test
(models/vision_encoder_decoder_test.py) plus mask-semantics checks."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image2text_tpu.configs.models import (
    ImageInputSpec,
    MoEConfig,
    MLPConfig,
    SelfAttentionConfig,
    SelfAttentionType,
    TransformerConfig,
    TransformerDecoderConfig,
    VisionEncoderDecoderConfig,
    VisionTransformerEncoderConfig,
)
from image2text_tpu.models.vision_encoder_decoder import VisionEncoderDecoder
from image2text_tpu.nn.core import Ctx
from image2text_tpu.utils.tree import flatten

KEY = jax.random.PRNGKey(0)


def tiny_config(use_cross_attn=True, use_soft_prompting=True, sparse=False,
                vocab_size=1024, block_size=256, advanced_pos_emb=False):
    decoder_transformer_config = TransformerConfig(
        rotator_config=MoEConfig(num_experts=4, proj_features=8,
                                 gate_sizes=None, ff_mult_factor=2.5, top_k=2),
        attn_config=SelfAttentionConfig(
            attn_type=SelfAttentionType.MULTI_QUERY, n_embd=64, n_head=4),
        is_causal=True,
        is_cross_attn=use_cross_attn,
        is_sparse_attn=sparse,
        max_block_size=block_size if sparse else None,
        sparsity_factor=0.5,
    )
    decoder_config = TransformerDecoderConfig(
        transformer_config=decoder_transformer_config,
        n_layer=2, block_size=block_size, vocab_size=vocab_size,
        use_advanced_pos_emb=advanced_pos_emb,
        advanced_pos_emb_gate_sizes=(16,) if advanced_pos_emb else None,
    )
    encoder_transformer_config = TransformerConfig(
        rotator_config=MoEConfig(num_experts=4, proj_features=8,
                                 gate_sizes=None, ff_mult_factor=2.5, top_k=2),
        attn_config=SelfAttentionConfig(
            attn_type=SelfAttentionType.MULTI_QUERY, n_embd=64, n_head=4),
        is_causal=False, is_cross_attn=False,
    )
    # reference-test shapes (n_cls=24, n_embd=64) at a CPU-friendly scale:
    # 64px images and 16² patch tokens instead of the reference's 128px/32²
    vision_encoder_config = VisionTransformerEncoderConfig(
        transformer_config=encoder_transformer_config,
        enable_gradient_checkpointing=True,
        input=ImageInputSpec(n_channels=3, width=64, height=64),
        n_layer=2, n_cls=24, num_patches=16, n_channels=32,
        feature_extractor_gate_sizes=(8, 16),
        feature_extractor_kernel_size=(4, 4),
    )
    return VisionEncoderDecoderConfig(
        vision_encoder_config=vision_encoder_config,
        decoder_config=decoder_config,
        use_cross_attn=use_cross_attn,
        use_soft_prompting=use_soft_prompting,
    )


def test_vision_encoder_decoder_reference_shapes():
    """The reference test asserts encoder (b,24,64) and logits (b,192,V)
    shapes (vision_encoder_decoder_test.py:86-88); batch reduced for CPU."""
    config = tiny_config()
    model = VisionEncoderDecoder(config)
    params = model.init(KEY)
    b = 4
    inp = jnp.asarray(
        np.random.default_rng(0).integers(0, 256, (b, 3, 64, 64)), jnp.float32)
    ids = jnp.asarray(np.random.default_rng(1).integers(0, 1024, (b, 192)))
    attn_mask = jnp.asarray(
        np.random.default_rng(2).integers(0, 2, (192, 192)).astype(bool))
    outs = model(params, inp, ids, attn_msk=attn_mask)
    assert outs.encoder_output.shape == (b, 24, 64)
    assert outs.logits.shape == (b, 192, 1024)
    assert not np.isnan(np.asarray(outs.logits)).any()


def test_soft_prompt_mask_semantics():
    """Under soft prompting with the scratch decoder, text hidden states are
    independent of the image prefix in self-attention (the reference's mask
    blocks text→prefix, vision_encoder_decoder.py:93-99); image info flows
    through cross-attention only."""
    config = tiny_config(use_cross_attn=False, use_soft_prompting=True)
    model = VisionEncoderDecoder(config)
    params = model.init(KEY)
    b = 2
    rng = np.random.default_rng(3)
    img1 = jnp.asarray(rng.standard_normal((b, 3, 64, 64)), jnp.float32)
    img2 = jnp.asarray(rng.standard_normal((b, 3, 64, 64)), jnp.float32)
    ids = jnp.asarray(rng.integers(0, 1024, (b, 16)))
    out1 = model(params, img1, ids)
    out2 = model(params, img2, ids)
    # text logits identical despite different images (no cross-attn)
    np.testing.assert_allclose(np.asarray(out1.logits), np.asarray(out2.logits),
                               atol=1e-5)
    # but with cross-attn they must differ
    config_ca = tiny_config(use_cross_attn=True, use_soft_prompting=True)
    model_ca = VisionEncoderDecoder(config_ca)
    params_ca = model_ca.init(KEY)
    o1 = model_ca(params_ca, img1, ids)
    o2 = model_ca(params_ca, img2, ids)
    assert not np.allclose(np.asarray(o1.logits), np.asarray(o2.logits), atol=1e-5)


def test_causality():
    """Future tokens must not influence past logits."""
    config = tiny_config(use_cross_attn=True, use_soft_prompting=True)
    model = VisionEncoderDecoder(config)
    params = model.init(KEY)
    rng = np.random.default_rng(4)
    img = jnp.asarray(rng.standard_normal((1, 3, 64, 64)), jnp.float32)
    ids = jnp.asarray(rng.integers(0, 1024, (1, 16)))
    ids2 = ids.at[0, 10].set((ids[0, 10] + 7) % 1024)
    l1 = np.asarray(model(params, img, ids).logits)
    l2 = np.asarray(model(params, img, ids2).logits)
    np.testing.assert_allclose(l1[:, :10], l2[:, :10], atol=1e-5)
    assert not np.allclose(l1[:, 10:], l2[:, 10:], atol=1e-5)


def test_encoder_output_reuse():
    config = tiny_config()
    model = VisionEncoderDecoder(config)
    params = model.init(KEY)
    rng = np.random.default_rng(5)
    img = jnp.asarray(rng.standard_normal((2, 3, 64, 64)), jnp.float32)
    ids = jnp.asarray(rng.integers(0, 1024, (2, 8)))
    out = model(params, img, ids)
    out2 = model(params, None, ids, encoder_output=out.encoder_output)
    np.testing.assert_allclose(np.asarray(out.logits), np.asarray(out2.logits),
                               atol=1e-6)


def test_sparse_decoder_and_advanced_pos_emb():
    config = tiny_config(sparse=True, advanced_pos_emb=True, block_size=64)
    model = VisionEncoderDecoder(config)
    params = model.init(KEY)
    rng = np.random.default_rng(6)
    img = jnp.asarray(rng.standard_normal((2, 3, 64, 64)), jnp.float32)
    ids = jnp.asarray(rng.integers(0, 1024, (2, 32)))
    out = model(params, img, ids)
    # block_size=64, ncls=24 -> text logits truncated to 64-24=40 >= 32
    assert out.logits.shape == (2, 32, 1024)
    assert not np.isnan(np.asarray(out.logits)).any()


def test_jit_and_train_mode():
    config = tiny_config()
    model = VisionEncoderDecoder(config)
    params = model.init(KEY)
    rng = np.random.default_rng(7)
    img = jnp.asarray(rng.standard_normal((2, 3, 64, 64)), jnp.float32)
    ids = jnp.asarray(rng.integers(0, 1024, (2, 8)))

    @jax.jit
    def fwd(p, img, ids, rng):
        return model(p, img, ids, ctx=Ctx(rng=rng, train=True)).logits

    logits = fwd(params, img, ids, jax.random.PRNGKey(1))
    assert logits.shape == (2, 8, 1024)
    assert not np.isnan(np.asarray(logits)).any()


def test_bridge_inserted_when_dims_differ():
    config = tiny_config()
    # encoder n_embd=64 == decoder n_embd=64 -> no bridge
    model = VisionEncoderDecoder(config)
    flat = flatten(model.init(KEY))
    assert not any(k.startswith("encoder.1.") for k in flat)
    # force a bridge by shrinking decoder width
    cfg2 = tiny_config()
    cfg2.decoder_config.transformer_config.attn_config.n_embd = 32
    cfg2.decoder_config.transformer_config.attn_config.n_head = 4
    model2 = VisionEncoderDecoder(cfg2)
    flat2 = flatten(model2.init(KEY))
    assert "encoder.1.weight" in flat2
    assert any(k.startswith("encoder.0.") for k in flat2)
