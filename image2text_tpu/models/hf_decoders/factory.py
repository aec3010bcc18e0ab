"""HF decoder family: Decoder-interface wrappers + model_str dispatch
(reference: models/decoder.py:119-134, 285-440).

Known model strings resolve from a built-in architecture table (no network
needed to *construct*); weights import from HF checkpoints via
``transformers`` when ``load_weights`` (requires network/cache — the
reference's ``from_pretrained`` behaves identically).  ``load_in_4bit``
maps bitsandbytes NF4 to our blockwise int quantization of the frozen
matmul weights (models/quantization.py).

Block-size caps and vocab asserts reproduce the reference exactly:
GPT-2 1024 (:376), Falcon 2048 + vocab ≥65024 (:396,386), Llama-2 4096 +
vocab ≥32000 (:416,406), Qwen from config + vocab ≥151936 (:436,426).
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from image2text_tpu.configs.models import HuggingfaceDecoderConfig
from image2text_tpu.nn.core import Ctx, Module
from image2text_tpu.models.decoder import Decoder
from image2text_tpu.models.hf_decoders.gpt2 import GPT2Backbone, import_hf_gpt2
from image2text_tpu.models.hf_decoders.llama import (
    LlamaArch,
    LlamaBackbone,
    import_hf_llama,
)
from image2text_tpu.models.hf_decoders.falcon import (
    FalconArch,
    FalconBackbone,
    import_hf_falcon,
)

GPT2_TABLE = {
    "gpt2": dict(n_layer=12, n_embd=768, n_head=12),
    "gpt2-medium": dict(n_layer=24, n_embd=1024, n_head=16),
    "gpt2-large": dict(n_layer=36, n_embd=1280, n_head=20),
    "gpt2-xl": dict(n_layer=48, n_embd=1600, n_head=25),
}

LLAMA_TABLE = {
    "meta-llama/Llama-2-7b-hf": LlamaArch(
        vocab_size=32000, n_layer=32, n_embd=4096, n_head=32, n_kv_head=32,
        intermediate=11008, max_positions=4096),
    "meta-llama/Llama-2-13b-hf": LlamaArch(
        vocab_size=32000, n_layer=40, n_embd=5120, n_head=40, n_kv_head=40,
        intermediate=13824, max_positions=4096),
}

QWEN_TABLE = {
    "deepseek-ai/DeepSeek-R1-Distill-Qwen-1.5B": LlamaArch(
        vocab_size=151936, n_layer=28, n_embd=1536, n_head=12, n_kv_head=2,
        intermediate=8960, max_positions=131072, rope_theta=10000.0,
        rms_eps=1e-6, qkv_bias=True, tie_embeddings=True),
}

FALCON_TABLE = {
    "tiiuae/falcon-7b": FalconArch(
        vocab_size=65024, n_layer=32, n_embd=4544, n_head=71,
        max_positions=2048),
    "tiiuae/falcon-7b-instruct": FalconArch(
        vocab_size=65024, n_layer=32, n_embd=4544, n_head=71,
        max_positions=2048),
}


def _resolve_local_hf_config(model_str: str):
    """If ``model_str`` points at a local HF checkpoint directory (or
    directly at a config.json), return the parsed config dict — the
    air-gapped analog of the reference's any-checkpoint
    ``from_pretrained`` (reference decoder.py:119-134, which lets HF
    resolve the architecture from the hub).  Returns None when
    ``model_str`` is a plain model id."""
    import json
    import os

    path = None
    if os.path.isfile(model_str) and model_str.endswith(".json"):
        path = model_str
    elif os.path.isdir(model_str):
        cand = os.path.join(model_str, "config.json")
        if os.path.isfile(cand):
            path = cand
    if path is None:
        return None
    with open(path) as f:
        return json.load(f)


def arch_from_hf_config(cfg: dict):
    """HF config.json dict → (family, arch) where family selects the
    decoder class/importer.  Covers the four families the reference's
    prefix dispatch reaches (gpt2 / llama / falcon / qwen2)."""
    mt = cfg.get("model_type")
    if mt == "gpt2":
        return "gpt2", dict(
            n_layer=cfg["n_layer"], n_embd=cfg["n_embd"],
            n_head=cfg["n_head"],
            n_positions=cfg.get("n_positions", 1024),
            vocab_size=cfg.get("vocab_size", 50257))
    if mt in ("llama", "qwen2"):
        return mt, LlamaArch(
            vocab_size=cfg["vocab_size"],
            n_layer=cfg["num_hidden_layers"],
            n_embd=cfg["hidden_size"],
            n_head=cfg["num_attention_heads"],
            n_kv_head=cfg.get("num_key_value_heads",
                              cfg["num_attention_heads"]),
            intermediate=cfg["intermediate_size"],
            max_positions=cfg.get("max_position_embeddings", 4096),
            rope_theta=cfg.get("rope_theta", 10000.0),
            rms_eps=cfg.get("rms_norm_eps", 1e-5),
            qkv_bias=(mt == "qwen2"),
            tie_embeddings=cfg.get("tie_word_embeddings", False))
    if mt == "falcon":
        if not cfg.get("multi_query", True):
            raise ValueError("Only multi_query falcon architectures are "
                             "supported (falcon-7b family)")
        return "falcon", FalconArch(
            vocab_size=cfg["vocab_size"],
            n_layer=cfg["num_hidden_layers"],
            n_embd=cfg["hidden_size"],
            n_head=cfg["num_attention_heads"],
            max_positions=cfg.get("max_position_embeddings", 2048),
            rope_theta=cfg.get("rope_theta", 10000.0),
            ln_eps=cfg.get("layer_norm_epsilon", 1e-5))
    raise ValueError(
        f"Unsupported HF model_type {mt!r} in config.json — supported "
        "families: gpt2, llama, qwen2, falcon")


class HuggingfaceDecoder(Decoder):
    """Shared plumbing: embeddings, tied-or-separate lm_head, KV cache,
    soft-prompt prefix handling (prefix lives in the decode cache — HF
    decoders are plain-causal, reference decoder.py:343-360)."""

    prefix_in_decode = True

    def __init__(self, config: HuggingfaceDecoderConfig, block_size: int,
                 n_embd: int, tied: bool, embed_path: str):
        super().__init__()
        self.config = config
        self._block_size = block_size
        self._n_embd = n_embd
        self.tied = tied
        self.embed_path = embed_path  # e.g. 'transformer.wte'
        self.vocab_eff = config.vocab_size + config.extra_tokens
        if tied:
            self.tied_aliases = {"lm_head.weight":
                                 f"{embed_path}.weight"}

    # -- init: pretrained import (reference from_pretrained) -----------------
    def init(self, key, path: str = ""):
        params = super().init(key, path)
        if getattr(self, "_load_weights", False):
            params = load_hf_weights(self, params)
        return params

    # -- Decoder interface ---------------------------------------------------
    def _embed_node(self, p):
        node = p
        for part in self.embed_path.split("."):
            node = node[part]
        return node

    def get_inputs_embeds(self, p, idx):
        node = self._embed_node(p)
        if "qweight" in node:
            from image2text_tpu.nn.modules import embedding_rows

            return embedding_rows(node, idx)
        return jnp.take(node["weight"], idx, axis=0)

    def _logits(self, p, hidden):
        node = self._embed_node(p) if self.tied else p["lm_head"]
        import jax

        if "qweight" in node:
            from image2text_tpu.nn.modules import int8_dot_rows

            return int8_dot_rows(hidden, node["qweight"], node["qscale"])
        return jax.lax.dot_general(
            hidden, node["weight"].astype(hidden.dtype),
            dimension_numbers=(((hidden.ndim - 1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

    @property
    def block_size(self) -> int:
        return self._block_size

    @property
    def n_embd(self) -> int:
        return self._n_embd

    @property
    def supports_kv_cache(self) -> bool:
        return True

    def init_cache(self, batch: int, max_len: int, dtype=jnp.float32):
        from image2text_tpu.models.kv_cache import KVCache

        shapes = [blk_attn.kv_shape(batch, max_len)
                  for blk_attn in self._block_attns()]
        return KVCache.create(shapes, dtype)

    def _block_attns(self):
        raise NotImplementedError


class GPT2HuggingfaceDecoder(HuggingfaceDecoder):
    def __init__(self, config: HuggingfaceDecoderConfig, args=None):
        if args is None:
            if config.model_str not in GPT2_TABLE:
                raise ValueError(
                    f"Unknown gpt2 model_str {config.model_str!r} — known: "
                    f"{sorted(GPT2_TABLE)}; or pass a local HF checkpoint "
                    "dir / config.json path as model_str")
            args = dict(GPT2_TABLE[config.model_str], n_positions=1024)
        args = dict(args)
        args.pop("vocab_size", None)
        n_positions = args.pop("n_positions", 1024)
        super().__init__(config, block_size=n_positions,
                         n_embd=args["n_embd"],
                         tied=True, embed_path="transformer.wte")
        self.backbone = self.add("transformer", GPT2Backbone(
            vocab_size=self.vocab_eff, n_positions=n_positions,
            dropout_rate=0.1, cross_attn=config.use_cross_attn, **args))
        self.backbone.enable_gradient_checkpointing = \
            config.enable_gradient_checkpointing

    def forward(self, p, idx=None, inputs_embeds=None, cross_attn_embeds=None,
                attn_msk=None, ctx: Ctx = Ctx(), use_flash: bool = True,
                kv_cache=None, pos_offset=None, cross_kv=None, **kwargs):
        assert not (idx is None and inputs_embeds is None)
        assert idx is None or inputs_embeds is None
        if inputs_embeds is None:
            inputs_embeds = self.get_inputs_embeds(p, idx)
        enc = cross_attn_embeds if self.config.use_cross_attn else None
        hidden = self.backbone(p["transformer"], inputs_embeds, enc=enc,
                               ctx=ctx, use_flash=use_flash,
                               kv_cache=kv_cache, pos_offset=pos_offset,
                               cross_kv=cross_kv)
        return self._logits(p, hidden), hidden

    def precompute_cross_kv(self, p, enc, quant=None):
        """Per-depth cross K/V from the fixed encoder output (decode-time).
        ``quant='int8'`` stores each depth's K/V quantized (serving mode —
        dequantized on read, halving the per-step cross-K/V HBM term)."""
        if not self.config.use_cross_attn:
            return {}
        return {depth: blk.crossattention.project_kv(
                    p["transformer"]["h"][str(depth)]["crossattention"], enc,
                    quant=quant)
                for depth, blk in enumerate(self.backbone.blocks)}

    def _block_attns(self):
        return [blk.attn for blk in self.backbone.blocks]


class _BackboneDecoder(HuggingfaceDecoder):
    """Llama/Qwen/Falcon: no cross-attention (reference raises for it)."""

    def forward(self, p, idx=None, inputs_embeds=None, cross_attn_embeds=None,
                attn_msk=None, ctx: Ctx = Ctx(), use_flash: bool = True,
                kv_cache=None, pos_offset=None, **kwargs):
        assert not (idx is None and inputs_embeds is None)
        assert idx is None or inputs_embeds is None
        if self.config.use_cross_attn:
            raise ValueError(
                "Don't know how to use cross attention with this model. "
                "Suggest you try a different config!!!")
        if inputs_embeds is None:
            inputs_embeds = self.get_inputs_embeds(p, idx)
        hidden = self.backbone(p[self._root], inputs_embeds, ctx=ctx,
                               use_flash=use_flash, kv_cache=kv_cache,
                               pos_offset=pos_offset)
        return self._logits(p, hidden), hidden


class LlamaHuggingfaceDecoder(_BackboneDecoder):
    _root = "model"

    def __init__(self, config: HuggingfaceDecoderConfig, arch: LlamaArch,
                 min_vocab: int):
        assert config.vocab_size >= min_vocab, "vocab should not shrink"
        import dataclasses

        # copy: LLAMA_TABLE/QWEN_TABLE entries are shared module state —
        # mutating vocab_size in place would leak across decoder instances
        arch = dataclasses.replace(
            arch, vocab_size=config.vocab_size + config.extra_tokens)
        super().__init__(config, block_size=arch.max_positions,
                         n_embd=arch.n_embd, tied=arch.tie_embeddings,
                         embed_path="model.embed_tokens")
        self.arch = arch
        self.backbone = self.add("model", LlamaBackbone(arch))
        self.backbone.enable_gradient_checkpointing = \
            config.enable_gradient_checkpointing
        if not arch.tie_embeddings:
            # an Embedding module (same torch (vocab, dim) weight layout):
            # _logits reads the weight directly, and int8_serving_params's
            # module-typed walk recognises it for the W8A8 form
            from image2text_tpu.nn.modules import Embedding

            self.add("lm_head", Embedding(arch.vocab_size, arch.n_embd,
                                          init_std=0.02))

    def _block_attns(self):
        return [blk.self_attn for blk in self.backbone.blocks]


class FalconHuggingfaceDecoder(_BackboneDecoder):
    _root = "transformer"

    def __init__(self, config: HuggingfaceDecoderConfig, arch: FalconArch):
        assert config.vocab_size >= 65024, "vocab should not shrink"
        arch.vocab_size = config.vocab_size + config.extra_tokens
        super().__init__(config, block_size=arch.max_positions,
                         n_embd=arch.n_embd, tied=True,
                         embed_path="transformer.word_embeddings")
        self.arch = arch
        self.backbone = self.add("transformer", FalconBackbone(arch))
        self.backbone.enable_gradient_checkpointing = \
            config.enable_gradient_checkpointing

    def _block_attns(self):
        return [blk.self_attention for blk in self.backbone.blocks]


def build_hf_decoder(config: HuggingfaceDecoderConfig,
                     load_weights: bool = True) -> Decoder:
    """model_str prefix dispatch (reference decoder.py:119-134) + optional
    pretrained-weight import + LoRA + 4-bit quantization."""
    s = config.model_str
    local_cfg = _resolve_local_hf_config(s)
    if local_cfg is not None:
        family, arch = arch_from_hf_config(local_cfg)
        if family == "gpt2":
            model = GPT2HuggingfaceDecoder(config, args=arch)
            importer = import_hf_gpt2
        elif family in ("llama", "qwen2"):
            model = LlamaHuggingfaceDecoder(config, arch,
                                            min_vocab=arch.vocab_size)
            importer = lambda p, sd, loose=False: import_hf_llama(
                p, sd, loose, tie_embeddings=arch.tie_embeddings)
        else:  # falcon
            model = FalconHuggingfaceDecoder(config, arch)
            importer = import_hf_falcon
    elif s.startswith("gpt2"):
        assert config.vocab_size >= 50257, "vocab should not shrink"
        model = GPT2HuggingfaceDecoder(config)
        importer = import_hf_gpt2
    elif "Llama-2" in s or "llama-2" in s.lower():
        if s not in LLAMA_TABLE:
            raise ValueError(
                f"Unknown Llama-2 model_str {s!r} — known: "
                f"{sorted(LLAMA_TABLE)}; or pass a local HF checkpoint "
                "dir / config.json path as model_str")
        arch = LLAMA_TABLE[s]
        model = LlamaHuggingfaceDecoder(config, arch, min_vocab=32000)
        importer = lambda p, sd, loose=False: import_hf_llama(
            p, sd, loose, tie_embeddings=arch.tie_embeddings)
    elif "Qwen" in s or "qwen" in s.lower():
        if s not in QWEN_TABLE:
            raise ValueError(
                f"Unknown Qwen model_str {s!r} — known: "
                f"{sorted(QWEN_TABLE)}; or pass a local HF checkpoint "
                "dir / config.json path as model_str")
        arch = QWEN_TABLE[s]
        model = LlamaHuggingfaceDecoder(config, arch, min_vocab=151936)
        importer = lambda p, sd, loose=False: import_hf_llama(
            p, sd, loose, tie_embeddings=arch.tie_embeddings)
    elif "falcon" in s.lower():
        if s not in FALCON_TABLE:
            raise ValueError(
                f"Unknown falcon model_str {s!r} — known: "
                f"{sorted(FALCON_TABLE)}; or pass a local HF checkpoint "
                "dir / config.json path as model_str")
        import dataclasses

        arch = dataclasses.replace(FALCON_TABLE[s])
        model = FalconHuggingfaceDecoder(config, arch)
        importer = import_hf_falcon
    else:
        raise ValueError(
            f"Unknown huggingface model_str: {s!r} — known ids: "
            f"{sorted(GPT2_TABLE) + sorted(LLAMA_TABLE) + sorted(QWEN_TABLE) + sorted(FALCON_TABLE)}; "
            "or pass a local HF checkpoint dir / config.json path")

    model._hf_importer = importer
    model._load_weights = load_weights
    if config.load_in_4bit:
        from image2text_tpu.models.quantization import quantize_module_structure

        # keep the (new, trainable) cross-attention modules in fp — the
        # frozen pretrained weights get blockwise int4 + scales
        quantize_module_structure(model, skip_paths=("crossattention",
                                                     "ln_cross_attn"))
    if config.lora_spec is not None:
        from image2text_tpu.models.lora import apply_lora

        model = apply_lora(model, config.lora_spec)
    return model


def load_hf_weights(decoder, params):
    """Fetch the HF checkpoint (network/cache) and import into ``params``."""
    from transformers import AutoModelForCausalLM

    m = AutoModelForCausalLM.from_pretrained(
        decoder.config.model_str, trust_remote_code=True)
    sd = {k: v.detach().cpu().numpy() for k, v in m.state_dict().items()}
    return decoder._hf_importer(params, sd)
