"""GPT-2 weight surgery: import a (randomly initialised, offline) HF torch
GPT2LMHeadModel and verify logits parity with our TransformerDecoder."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image2text_tpu.configs.models import (
    MLPConfig,
    SelfAttentionConfig,
    SelfAttentionType,
    TransformerConfig,
    TransformerDecoderConfig,
)
from image2text_tpu.models.decoder import TransformerDecoder
from image2text_tpu.models.hf_import import import_gpt2_state_dict

KEY = jax.random.PRNGKey(0)


def _tiny_decoder(vocab=128, block=64, n_layer=2, n_head=2, n_embd=32):
    cfg = TransformerDecoderConfig(
        transformer_config=TransformerConfig(
            rotator_config=MLPConfig(ff_mult=4.0),
            is_causal=True, is_cross_attn=False,
            attn_config=SelfAttentionConfig(
                attn_dropout=0.0, bias=True, dropout=0.0,
                n_head=n_head, n_embd=n_embd,
                attn_type=SelfAttentionType.MULTI_HEAD)),
        n_layer=n_layer, block_size=block, vocab_size=vocab)
    return TransformerDecoder(cfg)


def test_gpt2_import_logits_parity():
    torch = pytest.importorskip("torch")
    from transformers import GPT2Config, GPT2LMHeadModel

    hf_cfg = GPT2Config(
        vocab_size=128, n_positions=64, n_embd=32, n_layer=2, n_head=2,
        activation_function="gelu_new",
        resid_pdrop=0.0, embd_pdrop=0.0, attn_pdrop=0.0)
    hf = GPT2LMHeadModel(hf_cfg)
    hf.eval()

    dec = _tiny_decoder()
    params = dec.init(KEY)
    params = import_gpt2_state_dict(params, hf.state_dict(), loose=False)

    ids = np.random.default_rng(0).integers(0, 128, (3, 20))
    with torch.no_grad():
        ref = hf(torch.tensor(ids)).logits.numpy()
    ours, _ = dec(params, idx=jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-4, rtol=1e-3)


def test_gpt2_import_strict_and_loose():
    torch = pytest.importorskip("torch")
    from transformers import GPT2Config, GPT2LMHeadModel

    hf = GPT2LMHeadModel(GPT2Config(
        vocab_size=128, n_positions=64, n_embd=32, n_layer=2, n_head=2))
    # shorter block_size than the HF model: strict fails, loose keeps our wpe
    dec = _tiny_decoder(block=32)
    params = dec.init(KEY)
    with pytest.raises(ValueError):
        import_gpt2_state_dict(params, hf.state_dict(), loose=False)
    before = np.asarray(params["transformer"]["wpe"]["weight"])
    loaded = import_gpt2_state_dict(params, hf.state_dict(), loose=True)
    np.testing.assert_allclose(
        np.asarray(loaded["transformer"]["wpe"]["weight"]), before)
    # wte did load
    np.testing.assert_allclose(
        np.asarray(loaded["transformer"]["wte"]["weight"]),
        hf.state_dict()["transformer.wte.weight"].numpy())


def test_gpt2_import_vocab_growth():
    torch = pytest.importorskip("torch")
    from transformers import GPT2Config, GPT2LMHeadModel

    hf = GPT2LMHeadModel(GPT2Config(
        vocab_size=128, n_positions=64, n_embd=32, n_layer=2, n_head=2))
    dec = _tiny_decoder(vocab=130)  # two extra special tokens
    params = dec.init(KEY)
    loaded = import_gpt2_state_dict(params, hf.state_dict(), loose=False)
    wte = np.asarray(loaded["transformer"]["wte"]["weight"])
    np.testing.assert_allclose(
        wte[:128], hf.state_dict()["transformer.wte.weight"].numpy())
    # extra rows keep our initialisation
    np.testing.assert_allclose(
        wte[128:], np.asarray(params["transformer"]["wte"]["weight"])[128:])


def test_gpt2_strict_import_with_cross_attention():
    """Regression: strict import of a cross-attention scratch decoder must
    succeed — our cross_attn/ln_3 params are OUR additions (the reference
    leaves them at init, decoder.py:71-110), not missing base params."""
    torch = pytest.importorskip("torch")
    from transformers import GPT2Config, GPT2LMHeadModel

    hf = GPT2LMHeadModel(GPT2Config(
        vocab_size=128, n_positions=64, n_embd=32, n_layer=2, n_head=2))
    cfg = TransformerDecoderConfig(
        transformer_config=TransformerConfig(
            rotator_config=MLPConfig(ff_mult=4.0),
            is_causal=True, is_cross_attn=True,
            attn_config=SelfAttentionConfig(
                attn_dropout=0.0, bias=True, dropout=0.0,
                n_head=2, n_embd=32,
                attn_type=SelfAttentionType.MULTI_HEAD)),
        n_layer=2, block_size=64, vocab_size=128)
    dec = TransformerDecoder(cfg)
    params = dec.init(KEY)
    before = np.asarray(
        params["transformer"]["h"]["0"]["cross_attn"]["in_proj_weight"])
    loaded = import_gpt2_state_dict(params, hf.state_dict(), loose=False)
    # base params imported, cross-attn params untouched
    np.testing.assert_allclose(
        np.asarray(loaded["transformer"]["wte"]["weight"]),
        hf.state_dict()["transformer.wte.weight"].numpy())
    np.testing.assert_allclose(
        np.asarray(loaded["transformer"]["h"]["0"]["cross_attn"]
                   ["in_proj_weight"]), before)


def test_moe_experts_follow_gpt2_init_policy():
    """Regression: MoELinear stacked expert params get the reference's
    nn.Linear init (N(0, 0.02) weights, zero biases) from the scratch
    decoder's GPT-2 init policy."""
    from image2text_tpu.configs.models import MoEConfig

    cfg = TransformerDecoderConfig(
        transformer_config=TransformerConfig(
            rotator_config=MoEConfig(num_experts=4, proj_features=8,
                                     gate_sizes=None, ff_mult_factor=2.0,
                                     top_k=2),
            is_causal=True, is_cross_attn=False,
            attn_config=SelfAttentionConfig(
                attn_dropout=0.0, bias=True, dropout=0.0,
                n_head=2, n_embd=32,
                attn_type=SelfAttentionType.MULTI_HEAD)),
        n_layer=2, block_size=64, vocab_size=128)
    dec = TransformerDecoder(cfg)
    params = dec.init(KEY)
    blk = params["transformer"]["h"]["0"]["mlp"]["c_fc"]
    w = np.asarray(blk["l1_weight"])
    assert abs(float(w.std()) - 0.02) < 0.005, w.std()
    assert (np.asarray(blk["l1_bias"]) == 0).all()
    assert (np.asarray(blk["l2_bias"]) == 0).all()
