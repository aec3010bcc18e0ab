"""HF decoder family: numerical parity of our JAX backbones vs the actual
torch transformers implementations (random weights exported from tiny
config-built HF models — no network needed)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from image2text_tpu.configs.models import HuggingfaceDecoderConfig
from image2text_tpu.models.hf_decoders.factory import (
    FalconHuggingfaceDecoder,
    GPT2HuggingfaceDecoder,
    LlamaHuggingfaceDecoder,
)
from image2text_tpu.models.hf_decoders.gpt2 import import_hf_gpt2
from image2text_tpu.models.hf_decoders.llama import LlamaArch, import_hf_llama
from image2text_tpu.models.hf_decoders.falcon import FalconArch, import_hf_falcon

KEY = jax.random.PRNGKey(0)


def _np_sd(model):
    return {k: v.detach().cpu().numpy() for k, v in model.state_dict().items()}


def _cfg(model_str, vocab, extra=0, cross=False):
    return HuggingfaceDecoderConfig(
        model_str=model_str, use_cross_attn=cross, vocab_size=vocab,
        extra_tokens=extra, load_in_4bit=False,
        prepare_for_kbit_training=False)


def test_gpt2_parity_and_cross_attention():
    from transformers import GPT2Config, GPT2LMHeadModel

    from image2text_tpu.models.hf_decoders.factory import GPT2_TABLE
    GPT2_TABLE["gpt2"] = dict(n_layer=2, n_embd=32, n_head=2)
    try:
        hf = GPT2LMHeadModel(GPT2Config(
            n_layer=2, n_embd=32, n_head=2, vocab_size=96,
            add_cross_attention=True,
            resid_pdrop=0.0, embd_pdrop=0.0, attn_pdrop=0.0))
        hf.eval()
        ours = GPT2HuggingfaceDecoder(_cfg("gpt2", 96, cross=True))
        params = import_hf_gpt2(ours.init(KEY), _np_sd(hf))

        rng = np.random.default_rng(0)
        ids = rng.integers(0, 96, (2, 10))
        enc = rng.standard_normal((2, 4, 32)).astype(np.float32)
        with torch.no_grad():
            out = hf(input_ids=torch.tensor(ids),
                     encoder_hidden_states=torch.tensor(enc),
                     output_hidden_states=True)
        logits, hidden = ours(params, idx=jnp.asarray(ids),
                              cross_attn_embeds=jnp.asarray(enc),
                              use_flash=False)
        np.testing.assert_allclose(np.asarray(logits), out.logits.numpy(),
                                   atol=2e-4, rtol=2e-4)
        np.testing.assert_allclose(np.asarray(hidden),
                                   out.hidden_states[-1].numpy(),
                                   atol=2e-4, rtol=2e-4)
    finally:
        GPT2_TABLE["gpt2"] = dict(n_layer=12, n_embd=768, n_head=12)


def _llama_like_parity(hf_model, arch, model_str, vocab, tie):
    hf_model.eval()
    cfg = _cfg(model_str, vocab)
    ours = LlamaHuggingfaceDecoder(cfg, arch, min_vocab=0)
    params = import_hf_llama(ours.init(KEY), _np_sd(hf_model),
                             tie_embeddings=tie)
    rng = np.random.default_rng(1)
    ids = rng.integers(0, vocab, (2, 9))
    with torch.no_grad():
        out = hf_model(input_ids=torch.tensor(ids), output_hidden_states=True)
    logits, hidden = ours(params, idx=jnp.asarray(ids), use_flash=False)
    np.testing.assert_allclose(np.asarray(logits), out.logits.numpy(),
                               atol=3e-4, rtol=3e-4)
    return ours, params


def test_llama_parity():
    from transformers import LlamaConfig, LlamaForCausalLM

    hf = LlamaForCausalLM(LlamaConfig(
        num_hidden_layers=2, hidden_size=32, num_attention_heads=4,
        num_key_value_heads=2, intermediate_size=64, vocab_size=96,
        max_position_embeddings=128, rms_norm_eps=1e-5, rope_theta=10000.0,
        attention_dropout=0.0, tie_word_embeddings=False))
    arch = LlamaArch(vocab_size=96, n_layer=2, n_embd=32, n_head=4,
                     n_kv_head=2, intermediate=64, max_positions=128)
    _llama_like_parity(hf, arch, "meta-llama/Llama-2-7b-hf", 96, tie=False)


def test_qwen2_parity():
    from transformers import Qwen2Config, Qwen2ForCausalLM

    hf = Qwen2ForCausalLM(Qwen2Config(
        num_hidden_layers=2, hidden_size=32, num_attention_heads=4,
        num_key_value_heads=2, intermediate_size=64, vocab_size=96,
        max_position_embeddings=128, rms_norm_eps=1e-6, rope_theta=1e6,
        attention_dropout=0.0, tie_word_embeddings=True))
    arch = LlamaArch(vocab_size=96, n_layer=2, n_embd=32, n_head=4,
                     n_kv_head=2, intermediate=64, max_positions=128,
                     rope_theta=1e6, rms_eps=1e-6, qkv_bias=True,
                     tie_embeddings=True)
    _llama_like_parity(hf, arch, "Qwen/test", 96, tie=True)


def test_falcon_parity():
    from transformers import FalconConfig, FalconForCausalLM

    hf = FalconForCausalLM(FalconConfig(
        num_hidden_layers=2, hidden_size=32, num_attention_heads=4,
        vocab_size=96, multi_query=True, parallel_attn=True, bias=False,
        new_decoder_architecture=False, attention_dropout=0.0,
        hidden_dropout=0.0, rope_theta=10000.0))
    hf.eval()
    arch = FalconArch(vocab_size=96, n_layer=2, n_embd=32, n_head=4)
    cfg = HuggingfaceDecoderConfig(
        model_str="tiiuae/falcon-7b", use_cross_attn=False, vocab_size=96,
        extra_tokens=0, load_in_4bit=False, prepare_for_kbit_training=False)
    # bypass the 65024 vocab assert for the tiny test model
    ours = FalconHuggingfaceDecoder.__new__(FalconHuggingfaceDecoder)
    from image2text_tpu.models.hf_decoders.factory import HuggingfaceDecoder
    HuggingfaceDecoder.__init__(ours, cfg, block_size=2048, n_embd=32,
                                tied=True,
                                embed_path="transformer.word_embeddings")
    from image2text_tpu.models.hf_decoders.falcon import FalconBackbone
    ours.arch = arch
    ours.backbone = ours.add("transformer", FalconBackbone(arch))
    params = import_hf_falcon(ours.init(KEY), _np_sd(hf))
    rng = np.random.default_rng(2)
    ids = rng.integers(0, 96, (2, 9))
    with torch.no_grad():
        out = hf(input_ids=torch.tensor(ids), output_hidden_states=True)
    logits, hidden = ours(params, idx=jnp.asarray(ids), use_flash=False)
    np.testing.assert_allclose(np.asarray(logits), out.logits.numpy(),
                               atol=3e-4, rtol=3e-4)


def test_quantized_lora_gpt2_end_to_end():
    """load_in_4bit + LoRA: quantized frozen base under fp adapters; only
    adapters (+ force-enabled modules) train; VED generation runs."""
    from image2text_tpu.configs.models import (
        LoraSpec, MLPConfig, ImageInputSpec, SelfAttentionConfig,
        SelfAttentionType, TransformerConfig, VisionEncoderDecoderConfig,
        VisionTransformerEncoderConfig)
    from image2text_tpu.models.hf_decoders.factory import (GPT2_TABLE,
                                                           build_hf_decoder)
    from image2text_tpu.models.quantization import QuantizedLinear
    from image2text_tpu.models.vision_encoder_decoder import VisionEncoderDecoder
    from image2text_tpu.utils.tree import flatten

    GPT2_TABLE["gpt2"] = dict(n_layer=2, n_embd=32, n_head=2)
    try:
        # vocab >= 50257 satisfies the reference's no-shrink assert
        # (decoder.py:119-134); the tiny n_embd keeps the table small
        cfg = HuggingfaceDecoderConfig(
            model_str="gpt2", use_cross_attn=True, vocab_size=50257,
            extra_tokens=2, load_in_4bit=True, prepare_for_kbit_training=True,
            lora_spec=LoraSpec(r=4, lora_alpha=8, lora_dropout=0.0,
                               target_modules=["c_attn", "mlp.c_fc",
                                               "mlp.c_proj"],
                               force_enable_update_modules=["*.wpe.*", "*.wte.*",
                                                            "*.crossattention.*",
                                                            "*.ln_cross_attn.*"]))
        dec = build_hf_decoder(cfg, load_weights=False)
        # base attention projections are quantized + LoRA-wrapped
        blk = dec.backbone.blocks[0]
        assert isinstance(blk.attn.c_attn, QuantizedLinear)
        assert hasattr(blk.attn.c_attn, "scaling")  # LoRA mixin applied
        params = dec.init(KEY)
        flat = flatten(params)
        qkey = "transformer.h.0.attn.c_attn.weight"
        assert flat[qkey].dtype == jnp.uint8  # packed int4
        assert "transformer.h.0.attn.c_attn.lora_A.weight" in flat

        frozen = set(dec.frozen_param_paths())
        assert qkey in frozen
        assert "transformer.h.0.attn.c_attn.lora_A.weight" not in frozen
        # force-enabled cross-attention stays trainable
        assert not any("crossattention" in f for f in frozen)

        # forward + cached generation through a composite model
        enc_cfg = VisionTransformerEncoderConfig(
            transformer_config=TransformerConfig(
                rotator_config=MLPConfig(ff_mult=2.0),
                attn_config=SelfAttentionConfig(
                    attn_type=SelfAttentionType.MULTI_QUERY, n_embd=32,
                    n_head=2),
                is_causal=False, is_cross_attn=False),
            input=ImageInputSpec(n_channels=3, width=32, height=32),
            n_layer=1, n_cls=4, num_patches=8, n_channels=4)
        ved_cfg = VisionEncoderDecoderConfig(
            vision_encoder_config=enc_cfg, decoder_config=cfg,
            use_cross_attn=True, use_soft_prompting=True)
        model = VisionEncoderDecoder(ved_cfg, decoder=dec)
        vparams = model.init(jax.random.PRNGKey(1))
        img = jnp.asarray(np.random.default_rng(0).standard_normal(
            (2, 3, 32, 32)), jnp.float32)
        prompt = jnp.asarray([[1], [2]])
        fast = model.generate(vparams, img, prompt, max_new_tokens=5,
                              temperature=0.0)
        slow = model.generate(vparams, img, prompt, max_new_tokens=5,
                              temperature=0.0, force_no_cache=True)
        assert fast.shape == (2, 6)
        np.testing.assert_array_equal(np.asarray(fast), np.asarray(slow))
        # serving-mode int8 cross-KV must thread through the HF decoder's
        # precompute_cross_kv (regression: the kwarg existed only on the
        # scratch decoder) and stay greedy-equivalent at this tiny scale
        q8 = model.generate(vparams, img, prompt, max_new_tokens=5,
                            temperature=0.0, cross_kv_quant="int8")
        assert q8.shape == (2, 6)
        agree = float(np.mean(np.asarray(q8) == np.asarray(fast)))
        assert agree >= 0.75, f"int8 cross-KV greedy agreement {agree}"
    finally:
        GPT2_TABLE["gpt2"] = dict(n_layer=12, n_embd=768, n_head=12)


def test_beam_search_hf_prefix_in_cache():
    """Beam search over an HF (plain-causal) decoder: the soft-prompt prefix
    lives in the KV cache; cached loop == full-reforward loop in greedy
    mode."""
    from image2text_tpu.configs.models import (
        MLPConfig, ImageInputSpec, SelfAttentionConfig, SelfAttentionType,
        TransformerConfig, VisionEncoderDecoderConfig,
        VisionTransformerEncoderConfig)
    from image2text_tpu.models.generation_utils import BeamSearchTokenGenerator
    from image2text_tpu.models.hf_decoders.factory import (GPT2_TABLE,
                                                           build_hf_decoder)
    from image2text_tpu.models.vision_encoder_decoder import VisionEncoderDecoder

    GPT2_TABLE["gpt2"] = dict(n_layer=2, n_embd=32, n_head=2)
    try:
        dec_cfg = HuggingfaceDecoderConfig(
            model_str="gpt2", use_cross_attn=False, vocab_size=50257,
            extra_tokens=0, load_in_4bit=False,
            prepare_for_kbit_training=False)
        dec = build_hf_decoder(dec_cfg, load_weights=False)
        enc_cfg = VisionTransformerEncoderConfig(
            transformer_config=TransformerConfig(
                rotator_config=MLPConfig(ff_mult=2.0),
                attn_config=SelfAttentionConfig(
                    attn_type=SelfAttentionType.MULTI_QUERY, n_embd=32,
                    n_head=2),
                is_causal=False, is_cross_attn=False),
            input=ImageInputSpec(n_channels=3, width=32, height=32),
            n_layer=1, n_cls=4, num_patches=8, n_channels=4)
        ved_cfg = VisionEncoderDecoderConfig(
            vision_encoder_config=enc_cfg, decoder_config=dec_cfg,
            use_cross_attn=False, use_soft_prompting=True)
        model = VisionEncoderDecoder(ved_cfg, decoder=dec)
        params = model.init(jax.random.PRNGKey(2))
        img = jnp.asarray(np.random.default_rng(1).standard_normal(
            (2, 3, 32, 32)), jnp.float32)
        prompt = jnp.asarray([[5], [6]])
        gen = BeamSearchTokenGenerator(model, beam_width=2, temperature=0.0,
                                       max_new_tokens=4,
                                       beam_expansion_factor=2,
                                       consolidation_temperature=0.0)
        ids_fast, sc_fast = gen(params, img, prompt)
        cls = dec.__class__
        orig = cls.supports_kv_cache
        try:
            cls.supports_kv_cache = property(lambda self: False)
            ids_slow, sc_slow = gen(params, img, prompt)
        finally:
            cls.supports_kv_cache = orig
        np.testing.assert_array_equal(np.asarray(ids_fast),
                                      np.asarray(ids_slow))
        np.testing.assert_allclose(np.asarray(sc_fast), np.asarray(sc_slow),
                                   atol=1e-4)
        # soft-prompt prefix reaches the logits for HF decoders: different
        # images must change the generated beams (plain-causal attention)
        img2 = jnp.asarray(np.random.default_rng(9).standard_normal(
            (2, 3, 32, 32)), jnp.float32)
        ids_other, _ = gen(params, img2, prompt)
        assert not np.array_equal(np.asarray(ids_fast), np.asarray(ids_other))
    finally:
        GPT2_TABLE["gpt2"] = dict(n_layer=12, n_embd=768, n_head=12)


def test_quantization_roundtrip_accuracy():
    from image2text_tpu.models.quantization import (dequantize_blockwise,
                                                    quantize_blockwise)

    rng = np.random.default_rng(0)
    w = rng.standard_normal((16, 100)).astype(np.float32) * 0.05
    q, s = quantize_blockwise(w)
    back = np.asarray(dequantize_blockwise(jnp.asarray(q), jnp.asarray(s), 100))
    err = np.abs(back - w).max() / np.abs(w).max()
    assert err < 0.12, err  # int4 blockwise absmax: ~7% worst-case


def test_llama_kv_cache_decode():
    """Cached decode on the rotary/GQA path matches the full forward."""
    from image2text_tpu.models.kv_cache import CacheRef

    arch = LlamaArch(vocab_size=96, n_layer=2, n_embd=32, n_head=4,
                     n_kv_head=2, intermediate=64, max_positions=128)
    ours = LlamaHuggingfaceDecoder(_cfg("meta-llama/Llama-2-7b-hf", 96),
                                   LlamaArch(**vars(arch)), min_vocab=0)
    params = ours.init(KEY)
    rng = np.random.default_rng(3)
    ids = jnp.asarray(rng.integers(0, 96, (2, 8)))
    full_logits, _ = ours(params, idx=ids, use_flash=False)

    cache = ours.init_cache(2, 8)
    chunks = []
    ref = CacheRef(cache)
    l, _ = ours(params, idx=ids[:, :5], kv_cache=ref, pos_offset=0,
                use_flash=False)
    cache = ref.advanced()
    chunks.append(l)
    for i in range(5, 8):
        ref = CacheRef(cache)
        l, _ = ours(params, idx=ids[:, i:i + 1], kv_cache=ref, pos_offset=i,
                    use_flash=False)
        cache = ref.advanced()
        chunks.append(l)
    cached = jnp.concatenate(chunks, axis=1)
    np.testing.assert_allclose(np.asarray(cached), np.asarray(full_logits),
                               atol=2e-4, rtol=2e-4)


def test_int4_matmul_kernel_matches_dequant(monkeypatch):
    """Pallas fused dequant-matmul == XLA unpack+dot, incl. padding and
    row tiling (n > block)."""
    from image2text_tpu.models.quantization import (dequantize_blockwise,
                                                    quantize_blockwise)
    from image2text_tpu.ops import int4_matmul as int4_mod
    from image2text_tpu.ops.int4_matmul import int4_matmul

    # the default dispatch is the XLA path (no decision-grade speed win
    # yet); force the kernel so this test covers the Pallas code
    monkeypatch.setattr(int4_mod, "INT4_KERNEL", "pallas")

    rng = np.random.default_rng(0)
    for (n, in_f, out_f) in [(16, 256, 192), (8, 100, 40), (32, 448, 300),
                             (1040, 128, 64)]:
        w = rng.standard_normal((out_f, in_f)).astype(np.float32) * 0.05
        packed, scales = quantize_blockwise(w)
        in_pad = packed.shape[1] * 2
        x = jnp.asarray(rng.standard_normal((n, in_f)), jnp.float32)
        xp = jnp.pad(x, ((0, 0), (0, in_pad - in_f)))
        ours = np.asarray(int4_matmul(xp, jnp.asarray(packed),
                                      jnp.asarray(scales)))
        wd = np.asarray(dequantize_blockwise(jnp.asarray(packed),
                                             jnp.asarray(scales), in_f))
        ref = np.asarray(x) @ wd.T
        np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=2e-4,
                                   err_msg=f"{(n, in_f, out_f)}")


def test_int4_matmul_fallback_and_grad():
    """Shapes the kernel's tiling declines (packed width not a 128-multiple,
    e.g. Falcon's 4544→2272) must route to the XLA fallback instead of
    failing Mosaic lowering, and int4_matmul must differentiate (custom VJP
    dequantises through XLA) so kbit+LoRA training backprops through
    quantized layers."""
    from image2text_tpu.models.quantization import QuantizedLinear
    from image2text_tpu.ops.int4_matmul import _pick_bp, dequantize_int4

    assert _pick_bp(2272) is None      # Falcon n_embd=4544
    assert _pick_bp(128) == 128
    assert _pick_bp(4096) is not None

    rng = np.random.default_rng(1)
    lin = QuantizedLinear(320, 48, bias=True)   # halfw=160 → XLA fallback
    p = lin.init(jax.random.PRNGKey(0))
    w = rng.standard_normal((48, 320)).astype(np.float32) * 0.05
    from image2text_tpu.models.quantization import quantize_blockwise
    q, s = quantize_blockwise(w)
    p = {"weight": jnp.asarray(q), "weight_scales": jnp.asarray(s),
         "bias": p["bias"]}
    x = jnp.asarray(rng.standard_normal((16, 320)), jnp.float32)
    y = lin(p, x)                       # n_rows >= 8: kernel-dispatch path
    wd = np.asarray(dequantize_int4(p["weight"], p["weight_scales"]))[:, :320]
    np.testing.assert_allclose(np.asarray(y), np.asarray(x) @ wd.T,
                               atol=2e-4, rtol=2e-4)

    # gradient flows through the quantized matmul back to the activations
    def loss(x):
        return (lin(p, x) ** 2).sum()

    g = jax.grad(loss)(x)
    eps = 1e-3
    x0 = np.asarray(x)
    d = np.zeros_like(x0)
    d[0, 0] = eps
    num = (loss(jnp.asarray(x0 + d)) - loss(jnp.asarray(x0 - d))) / (2 * eps)
    np.testing.assert_allclose(float(g[0, 0]), float(num), rtol=2e-2)


def test_int4_quantization_reconstruction():
    """Paired-strip quantisation reconstructs within int4 error bounds."""
    from image2text_tpu.models.quantization import (dequantize_blockwise,
                                                    quantize_blockwise)

    rng = np.random.default_rng(1)
    w = rng.standard_normal((16, 200)).astype(np.float32) * 0.05
    packed, scales = quantize_blockwise(w)
    back = np.asarray(dequantize_blockwise(jnp.asarray(packed),
                                           jnp.asarray(scales), 200))
    err = np.abs(back - w).max() / np.abs(w).max()
    assert err < 0.12, err


def test_hf_gpt2_int8_serving_generate():
    """W8A8 serving on the HF family: factory lm_head/embeddings and the
    gpt2 wpe dispatch on the int8 form; quantized greedy generate runs
    under jit and tracks the float path."""
    from image2text_tpu.configs.models import (
        MLPConfig, ImageInputSpec, SelfAttentionConfig, SelfAttentionType,
        TransformerConfig, VisionEncoderDecoderConfig,
        VisionTransformerEncoderConfig)
    from image2text_tpu.models.hf_decoders.factory import (GPT2_TABLE,
                                                           build_hf_decoder)
    from image2text_tpu.models.quantization import int8_serving_params
    from image2text_tpu.models.vision_encoder_decoder import VisionEncoderDecoder

    GPT2_TABLE["gpt2"] = dict(n_layer=2, n_embd=32, n_head=2)
    try:
        dec_cfg = HuggingfaceDecoderConfig(
            model_str="gpt2", use_cross_attn=False, vocab_size=50257,
            extra_tokens=0, load_in_4bit=False,
            prepare_for_kbit_training=False)
        dec = build_hf_decoder(dec_cfg, load_weights=False)
        enc_cfg = VisionTransformerEncoderConfig(
            transformer_config=TransformerConfig(
                rotator_config=MLPConfig(ff_mult=2.0),
                attn_config=SelfAttentionConfig(
                    attn_type=SelfAttentionType.MULTI_QUERY, n_embd=32,
                    n_head=2),
                is_causal=False, is_cross_attn=False),
            input=ImageInputSpec(n_channels=3, width=32, height=32),
            n_layer=1, n_cls=4, num_patches=8, n_channels=4)
        ved_cfg = VisionEncoderDecoderConfig(
            vision_encoder_config=enc_cfg, decoder_config=dec_cfg,
            use_cross_attn=False, use_soft_prompting=True)
        model = VisionEncoderDecoder(ved_cfg, decoder=dec)
        params = model.init(jax.random.PRNGKey(2))
        pq = dict(params)
        pq["decoder"] = int8_serving_params(model.decoder, params["decoder"],
                                            min_elems=1)
        # the tied wte (vocab x 32) must be in int8 form
        assert "qweight" in pq["decoder"]["transformer"]["wte"]

        img = jnp.asarray(np.random.default_rng(1).standard_normal(
            (2, 3, 32, 32)), jnp.float32)
        prompt = jnp.asarray([[5], [6]])
        g = np.asarray(jax.jit(lambda p, im, pr: model.generate(
            p, im, pr, max_new_tokens=5, temperature=0.0))(pq, img, prompt))
        assert g.shape == (2, 6)
        g_exact = np.asarray(model.generate(params, img, prompt,
                                            max_new_tokens=5,
                                            temperature=0.0))
        agree = (g == g_exact).mean()
        assert agree >= 0.5, f"greedy agreement {agree}"
    finally:
        GPT2_TABLE["gpt2"] = dict(n_layer=12, n_embd=768, n_head=12)


def test_hf_backbone_remat_and_policy():
    """``enable_gradient_checkpointing`` must actually remat the HF
    backbones (reference decoder.py:324-325 enables HF gradient
    checkpointing; round-3 fix — previously the flag was silently
    ignored): the traced program contains per-block ``remat`` calls,
    loss/grads are unchanged (remat is numerics-free), and
    ``remat_policy='dots'`` composes on top."""
    from image2text_tpu.models.hf_decoders.factory import (
        GPT2_TABLE,
        build_hf_decoder,
    )
    from image2text_tpu.nn.core import Ctx
    from image2text_tpu.training.remat import set_remat_policy
    from image2text_tpu.utils.tree import flatten

    old = GPT2_TABLE["gpt2"]
    GPT2_TABLE["gpt2"] = dict(n_layer=2, n_embd=32, n_head=2)
    try:
        ids = jnp.asarray(np.random.default_rng(0).integers(0, 1000, (2, 16)))
        out = {}
        for name, (remat, policy) in (("off", (False, None)),
                                      ("on", (True, None)),
                                      ("dots", (True, "dots"))):
            cfg = HuggingfaceDecoderConfig(
                model_str="gpt2", use_cross_attn=False, vocab_size=50257,
                extra_tokens=0, load_in_4bit=False,
                prepare_for_kbit_training=False,
                enable_gradient_checkpointing=remat)
            dec = build_hf_decoder(cfg, load_weights=False)
            if policy is not None:
                assert set_remat_policy(dec, policy) >= 1
            params = dec.init(KEY)

            def loss_fn(p):
                logits, _ = dec(p, idx=ids,
                                ctx=Ctx(rng=jax.random.PRNGKey(1), train=True),
                                use_flash=False)
                return jnp.mean(jax.nn.log_softmax(logits)[..., 7])

            n_remat = str(jax.make_jaxpr(loss_fn)(params)).count("remat")
            loss, grads = jax.jit(jax.value_and_grad(loss_fn))(params)
            out[name] = (float(loss), flatten(grads), n_remat)
    finally:
        GPT2_TABLE["gpt2"] = old

    assert out["off"][2] == 0
    assert out["on"][2] >= 2 and out["dots"][2] >= 2  # one per block
    for variant in ("on", "dots"):
        np.testing.assert_allclose(out["off"][0], out[variant][0], rtol=1e-6)
        for k, g in out["off"][1].items():
            np.testing.assert_allclose(np.asarray(g),
                                       np.asarray(out[variant][1][k]),
                                       rtol=2e-5, atol=1e-7, err_msg=k)


# -- round-5: factory hardening (VERDICT r04 item 5) -------------------------

def test_factory_unknown_model_strings_raise():
    """Unknown model ids must raise with the known-id list — in particular
    unknown "falcon" strings must NOT silently build falcon-7b dims
    (round-4 defect: factory.py any-falcon branch)."""
    from image2text_tpu.models.hf_decoders.factory import build_hf_decoder

    for s in ("gpt2-turbo", "meta-llama/Llama-2-70b-hf", "Qwen/Qwen2-7B",
              "tiiuae/falcon-40b", "mistralai/Mistral-7B-v0.1"):
        with pytest.raises(ValueError, match="nknown"):
            build_hf_decoder(_cfg(s, 200000), load_weights=False)


def test_factory_local_config_json_gpt2_parity(tmp_path):
    """The reference builds ANY checkpoint via from_pretrained (reference
    decoder.py:119-134, HF resolves the architecture).  Air-gapped analog:
    model_str may be a local HF checkpoint dir whose config.json drives
    construction.  Oracle: the factory-built decoder imports a tiny HF
    GPT-2's weights and matches its logits."""
    import json

    from transformers import GPT2Config, GPT2LMHeadModel

    from image2text_tpu.models.hf_decoders.factory import build_hf_decoder

    d = tmp_path / "my-gpt2-ckpt"
    d.mkdir()
    (d / "config.json").write_text(json.dumps(
        {"model_type": "gpt2", "n_layer": 2, "n_embd": 32, "n_head": 2,
         "n_positions": 64, "vocab_size": 96}))
    dec = build_hf_decoder(_cfg(str(d), 96), load_weights=False)
    assert dec.block_size == 64
    hf = GPT2LMHeadModel(GPT2Config(
        n_layer=2, n_embd=32, n_head=2, vocab_size=96, n_positions=64,
        resid_pdrop=0.0, embd_pdrop=0.0, attn_pdrop=0.0))
    hf.eval()
    params = dec._hf_importer(dec.init(KEY), _np_sd(hf))
    rng = np.random.default_rng(7)
    ids = rng.integers(0, 96, (2, 10))
    with torch.no_grad():
        out = hf(input_ids=torch.tensor(ids))
    logits, _ = dec(params, idx=jnp.asarray(ids), use_flash=False)
    np.testing.assert_allclose(np.asarray(logits), out.logits.numpy(),
                               atol=2e-4, rtol=2e-4)


def test_factory_local_config_json_llama_parity(tmp_path):
    """config.json-driven construction dispatches llama-family dims (incl.
    GQA heads) and the factory-built decoder passes the importer oracle."""
    import json

    from transformers import LlamaConfig, LlamaForCausalLM

    from image2text_tpu.models.hf_decoders.factory import (
        LlamaHuggingfaceDecoder, build_hf_decoder)

    d = tmp_path / "my-llama-ckpt"
    d.mkdir()
    (d / "config.json").write_text(json.dumps(
        {"model_type": "llama", "num_hidden_layers": 2, "hidden_size": 32,
         "num_attention_heads": 4, "num_key_value_heads": 2,
         "intermediate_size": 64, "vocab_size": 96,
         "max_position_embeddings": 128, "rms_norm_eps": 1e-5,
         "rope_theta": 10000.0, "tie_word_embeddings": False}))
    dec = build_hf_decoder(_cfg(str(d), 96), load_weights=False)
    assert isinstance(dec, LlamaHuggingfaceDecoder)
    assert dec.arch.n_kv_head == 2 and dec.arch.intermediate == 64
    hf = LlamaForCausalLM(LlamaConfig(
        num_hidden_layers=2, hidden_size=32, num_attention_heads=4,
        num_key_value_heads=2, intermediate_size=64, vocab_size=96,
        max_position_embeddings=128, rms_norm_eps=1e-5, rope_theta=10000.0,
        attention_dropout=0.0, tie_word_embeddings=False))
    hf.eval()
    params = dec._hf_importer(dec.init(KEY), _np_sd(hf))
    rng = np.random.default_rng(8)
    ids = rng.integers(0, 96, (2, 9))
    with torch.no_grad():
        out = hf(input_ids=torch.tensor(ids))
    logits, _ = dec(params, idx=jnp.asarray(ids), use_flash=False)
    np.testing.assert_allclose(np.asarray(logits), out.logits.numpy(),
                               atol=3e-4, rtol=3e-4)


def test_arch_from_hf_config_families():
    """qwen2 gets qkv_bias; falcon maps epsilon/rope; non-multi_query
    falcon and unknown model_type raise."""
    from image2text_tpu.models.hf_decoders.factory import arch_from_hf_config

    fam, arch = arch_from_hf_config(
        {"model_type": "qwen2", "num_hidden_layers": 2, "hidden_size": 32,
         "num_attention_heads": 4, "num_key_value_heads": 2,
         "intermediate_size": 64, "vocab_size": 96,
         "tie_word_embeddings": True})
    assert fam == "qwen2" and arch.qkv_bias and arch.tie_embeddings

    fam, arch = arch_from_hf_config(
        {"model_type": "falcon", "num_hidden_layers": 2, "hidden_size": 32,
         "num_attention_heads": 4, "vocab_size": 96, "multi_query": True,
         "layer_norm_epsilon": 1e-6, "rope_theta": 5e5})
    assert fam == "falcon" and arch.ln_eps == 1e-6 and arch.rope_theta == 5e5

    with pytest.raises(ValueError):
        arch_from_hf_config({"model_type": "falcon", "multi_query": False,
                             "num_hidden_layers": 2, "hidden_size": 32,
                             "num_attention_heads": 4, "vocab_size": 96})
    with pytest.raises(ValueError):
        arch_from_hf_config({"model_type": "mistral"})
