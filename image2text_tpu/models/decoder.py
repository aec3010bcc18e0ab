"""Causal-LM decoders (reference: models/decoder.py).

* :class:`TransformerDecoder` — nanoGPT-style scratch decoder with optional
  GPT-2 pretrained initialization (Conv1D-transposed weight surgery), weight
  tying, alternating cross-attention, advanced positional MLP, MoE/sparse
  options (decoder.py:161-283).
* HF decoder family (GPT-2 / Falcon / Llama-2 / Qwen-2) — first-party JAX
  ports with HF-checkpoint importers, in models/hf_decoders/.

Weight tying is structural here: ``lm_head`` reads the ``wte`` table, and the
checkpoint layer materialises the reference's duplicated ``lm_head.weight``
key (see utils/checkpoint.py).
"""
from __future__ import annotations

import math
from typing import Optional, Union

import jax
import jax.numpy as jnp

from image2text_tpu.configs.models import (
    HuggingfaceDecoderConfig,
    MLPConfig,
    ModelType,
    TransformerDecoderConfig,
)
from image2text_tpu.nn.core import Ctx, Module, ModuleList, dropout, normal_init, zeros_init, _path_key
from image2text_tpu.nn.modules import Embedding, LayerNorm
from image2text_tpu.models.layers import AdvancedPositionalBiasMLP, TransformerBlock
from image2text_tpu.ops.static_gather import canonicalize


GPT2_MODEL_TABLE = {
    ModelType.GPT2: dict(n_layer=12, n_head=12, n_embd=768),           # 124M
    ModelType.GPT2_MEDIUM: dict(n_layer=24, n_head=16, n_embd=1024),   # 350M
    ModelType.GPT2_LARGE: dict(n_layer=36, n_head=20, n_embd=1280),    # 774M
    ModelType.GPT2_XL: dict(n_layer=48, n_head=25, n_embd=1600),       # 1558M
}


def mutate_transformer_config(config, depth: int, skip_alternate_cross_attn: bool):
    """Disable cross-attention on odd depths (reference models/utils.py:39-43)."""
    if config.is_cross_attn and skip_alternate_cross_attn and depth % 2:
        config = config.model_copy(deep=True)
        config.is_cross_attn = False
    return config


class Decoder(Module):
    """Base: forward(p, idx|inputs_embeds, cross_attn_embeds, attn_msk) ->
    (logits, hidden)."""

    @classmethod
    def from_config(cls, config: Union[TransformerDecoderConfig,
                                       HuggingfaceDecoderConfig],
                    loose: bool = False, space_for_prompt: int = 0) -> "Decoder":
        if isinstance(config, TransformerDecoderConfig):
            if config.pretrained_model is None:
                return TransformerDecoder(config, space_for_prompt)
            args = GPT2_MODEL_TABLE[config.pretrained_model]
            if not loose:
                msg = "provided configs do not match the pretrained model"
                assert config.n_layer == args["n_layer"], msg
                assert config.transformer_config.attn_config.n_embd == args["n_embd"], msg
                assert config.transformer_config.attn_config.n_head == args["n_head"], msg
                assert config.transformer_config.attn_config.bias is True, msg
                assert config.block_size == 1024, msg
                assert not config.transformer_config.is_sparse_attn, msg
                assert config.transformer_config.is_causal is True, msg
                assert isinstance(config.transformer_config.rotator_config, MLPConfig) \
                    and config.transformer_config.rotator_config.ff_mult == 4, msg
            assert config.vocab_size >= 50257, "vocab should not shrink"
            model = TransformerDecoder(config, space_for_prompt,
                                       pretrained_model=config.pretrained_model,
                                       loose=loose)
            if config.lora_spec is not None:
                from image2text_tpu.models.lora import apply_lora
                model = apply_lora(model, config.lora_spec)
            return model
        if isinstance(config, HuggingfaceDecoderConfig):
            from image2text_tpu.models.hf_decoders.factory import build_hf_decoder
            return build_hf_decoder(config)
        raise ValueError("Unknown config type!!!")

    def get_inputs_embeds(self, p, idx):
        raise NotImplementedError

    @property
    def supports_kv_cache(self) -> bool:
        return False

    def init_cache(self, batch: int, max_len: int, dtype=jnp.float32):
        raise NotImplementedError(f"{type(self).__name__} has no KV cache")

    @property
    def block_size(self) -> int:
        raise NotImplementedError

    @property
    def n_embd(self) -> int:
        raise NotImplementedError


class TransformerDecoder(Decoder):
    def __init__(self, config: TransformerDecoderConfig, space_for_prompt: int = 0,
                 pretrained_model: Optional[ModelType] = None, loose: bool = False):
        super().__init__()
        self.config = config
        self.use_advanced_pos_emb = config.use_advanced_pos_emb
        self.enable_gradient_checkpointing = config.enable_gradient_checkpointing
        self.skip_alternate_cross_attn = config.skip_alternate_cross_attn
        self.pretrained_model = pretrained_model
        self.loose = loose
        self.tied_aliases = {"lm_head.weight": "transformer.wte.weight"}

        n_embd = config.transformer_config.attn_config.n_embd
        transformer = Module()
        self.wte = transformer.add("wte", Embedding(config.vocab_size, n_embd))
        if self.use_advanced_pos_emb:
            self.wpe = transformer.add("wpe", AdvancedPositionalBiasMLP(
                context_width=config.block_size, in_features=n_embd,
                out_features=n_embd, gate_sizes=config.advanced_pos_emb_gate_sizes,
                add_residual_connection=True))
        else:
            self.wpe = transformer.add("wpe", Embedding(config.block_size, n_embd))
        blocks = ModuleList([
            TransformerBlock(
                mutate_transformer_config(config.transformer_config, depth,
                                          config.skip_alternate_cross_attn),
                depth, space_for_prompt)
            for depth in range(config.n_layer)
        ])
        self.blocks = transformer.add("h", blocks)
        self.ln_f = transformer.add("ln_f", LayerNorm(
            n_embd, bias=config.transformer_config.attn_config.bias))
        self.transformer = self.add("transformer", transformer)
        self.dropout_rate = config.transformer_config.attn_config.dropout

    # -- init: GPT-2 policy (reference decoder.py:193-212) ------------------
    def init(self, key, path: str = ""):
        params = super().init(key, path)
        specs = self.param_specs()
        from image2text_tpu.utils.tree import flatten, unflatten
        flat = flatten(params)
        n_layer = self.config.n_layer
        for p, spec in specs.items():
            subkey = _path_key(key, (f"{path}.{p}" if path else p) + "#gpt2init")
            if spec.owner == "Linear" and spec.name == "weight":
                std = 0.02
                if p.endswith("c_proj.weight"):
                    std = 0.02 / math.sqrt(2 * n_layer)
                flat[p] = std * jax.random.normal(subkey, spec.shape, spec.dtype)
            elif spec.owner == "Linear" and spec.name == "bias":
                flat[p] = jnp.zeros(spec.shape, spec.dtype)
            elif spec.owner == "Embedding" and spec.name == "weight":
                flat[p] = 0.02 * jax.random.normal(subkey, spec.shape, spec.dtype)
            elif spec.owner == "AdvancedPositionalBiasMLP":
                # its per-position MLPs are nn.Linears in the reference, so
                # the GPT-2 init policy covers them (decoder.py:193-212)
                if spec.name.startswith("w"):
                    flat[p] = 0.02 * jax.random.normal(subkey, spec.shape,
                                                       spec.dtype)
                else:
                    flat[p] = jnp.zeros(spec.shape, spec.dtype)
            elif spec.owner == "MoELinear":
                # the stacked expert params correspond to _MoEUnit
                # nn.Linears in the reference, which self.apply covers too:
                # N(0, 0.02) weights, zero biases.  (Their names end in
                # l{1,2}_weight, never 'c_proj.weight', so the residual
                # scaling does not apply — matching the reference.)
                if spec.name.endswith("weight"):
                    flat[p] = 0.02 * jax.random.normal(subkey, spec.shape,
                                                       spec.dtype)
                else:
                    flat[p] = jnp.zeros(spec.shape, spec.dtype)
        params = unflatten(flat)
        if self.pretrained_model is not None:
            from image2text_tpu.models.hf_import import load_pretrained_gpt2_params
            params = load_pretrained_gpt2_params(
                params, self.pretrained_model, self.config.vocab_size, self.loose)
        return params

    # -- decode-time cross-attention K/V precompute --------------------------
    def precompute_cross_kv(self, p, enc, quant=None):
        """Per-depth split-head cross K/V from the (fixed) encoder output —
        computed once per generated sequence instead of once per token.
        ``quant='int8'`` stores each depth's K/V quantized (serving mode,
        see nn.modules.QuantizedKV)."""
        out = {}
        for depth, blk in enumerate(self.blocks):
            use_cross = blk.is_cross_attn and (
                not self.skip_alternate_cross_attn or depth % 2 == 0)
            if use_cross:
                bp = p["transformer"]["h"][str(depth)]
                out[depth] = blk.cross_attn.project_kv(bp["cross_attn"], enc,
                                                       enc, quant=quant)
        return out

    # -- forward -------------------------------------------------------------
    def forward(self, p, idx=None, inputs_embeds=None, cross_attn_embeds=None,
                attn_msk=None, ctx: Ctx = Ctx(), use_flash: bool = True,
                kv_cache=None, pos_offset=None, cross_kv=None,
                sparse_rule_len=None, **kwargs):
        assert not (idx is None and inputs_embeds is None)
        assert idx is None or inputs_embeds is None
        if inputs_embeds is None:
            inputs_embeds = self.wte(p["transformer"]["wte"], idx)
        t = inputs_embeds.shape[-2]
        assert t <= self.block_size, (
            f"Cannot forward sequence of length {t}, block size is only "
            f"{self.block_size}")

        import numpy as np

        if pos_offset is None:
            positions = np.arange(t)
        elif isinstance(pos_offset, (int, np.integer)):
            # static chunk positions (e.g. generation prefill): keep numpy
            # so sparse blocks can resolve their selections at trace time
            positions = pos_offset + np.arange(t)
        else:
            positions = pos_offset + jnp.arange(t)
        if kv_cache is not None:
            kv_cache.positions = positions
        if self.use_advanced_pos_emb:
            if pos_offset is None:
                x = self.wpe(p["transformer"]["wpe"], inputs_embeds, ctx=ctx.fold(1))
            else:
                x = self.wpe.forward_at(p["transformer"]["wpe"], inputs_embeds,
                                        positions, ctx=ctx.fold(1))
        else:
            # through the Embedding module, which also serves the int8
            # serving form (qweight rows + scales)
            pos_emb = self.wpe(p["transformer"]["wpe"], jnp.asarray(positions))
            x = inputs_embeds + pos_emb.astype(inputs_embeds.dtype)
        x, ctx = dropout(x, self.dropout_rate, ctx.fold(2))

        # lazy sparse layout (see TransformerBlock.forward): only the
        # plain forward threads it — the cached path manages its own
        # slot-rank gathers and the generation fallback's global bypass
        # rule needs canonical buffers per block
        lazy = kv_cache is None and sparse_rule_len is None
        layout = None
        for depth, blk in enumerate(self.blocks):
            if self.skip_alternate_cross_attn:
                cross_inputs = cross_attn_embeds if depth % 2 == 0 else None
            else:
                cross_inputs = cross_attn_embeds
            bp = p["transformer"]["h"][str(depth)]
            bctx = ctx.fold(100 + depth)
            new_layout = blk.next_layout(layout, x.shape[1]) if lazy else None
            if self.enable_gradient_checkpointing and ctx.train:
                def run(bp_, x_, ci_, am_, rng_, blk_=blk, layout_=layout,
                        lazy_=lazy):
                    out = blk_(bp_, x_, cross_attn_inputs=ci_, attn_mask=am_,
                               ctx=Ctx(rng=rng_, train=True),
                               use_flash=use_flash, layout=layout_,
                               want_lazy=lazy_)
                    return out[0] if lazy_ else out
                x = jax.checkpoint(
                    run, policy=getattr(self, "_remat_policy", None))(
                        bp, x, cross_inputs, attn_msk, bctx.rng)
            else:
                ckv = cross_kv.get(depth) if cross_kv is not None else None
                x = blk(bp, x,
                        cross_attn_inputs=None if ckv is not None else cross_inputs,
                        attn_mask=attn_msk, ctx=bctx, use_flash=use_flash,
                        kv_cache=kv_cache, cross_kv=ckv,
                        sparse_rule_len=sparse_rule_len,
                        layout=layout, want_lazy=lazy)
                if lazy:
                    x = x[0]
            layout = new_layout
        if layout is not None:
            x = canonicalize(x, layout)
        x = self.ln_f(p["transformer"]["ln_f"], x)
        wte = p["transformer"]["wte"]
        if "qweight" in wte:
            # int8 serving form: the tied lm_head is the single largest
            # per-decode-step weight read (vocab x d); W8A8 halves it
            from image2text_tpu.nn.modules import int8_dot_rows

            logits = int8_dot_rows(x, wte["qweight"], wte["qscale"])
        else:
            logits = jax.lax.dot_general(
                x, wte["weight"].astype(x.dtype),
                dimension_numbers=(((x.ndim - 1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
        return logits, x

    def get_inputs_embeds(self, p, idx):
        return self.wte(p["transformer"]["wte"], idx)

    # -- KV-cached decoding --------------------------------------------------
    @property
    def is_causal(self) -> bool:
        """Block-level causality (the composite model imposes none — the
        reference's mask conversion discards its tril; see
        vision_encoder_decoder.py). Generation paths branch on this."""
        return self.config.transformer_config.is_causal

    @property
    def supports_kv_cache(self) -> bool:
        return True  # incl. sparse layers (rank-among-selected cache slots)

    def cache_exact_for_window(self, start: int, end: int) -> bool:
        """Whether cached decode over global positions [start, end) is exact.

        The reference's sparse bypass rule is global per forward call
        (<2 positions selected at the current length → EVERY position takes
        the null path, layers.py:570-577), which makes earlier hidden
        states change retroactively when the count crosses 2 — a cached
        prefix cannot reproduce that.  Exact iff, for every sparse layer,
        the count is already ≥2 at the window start or never reaches 2 by
        its end (soft-prompt models always qualify: the always-selected CLS
        prefix keeps the count ≥ n_cls)."""
        for blk in self.blocks:
            if not blk.is_sparse:
                continue
            c = blk._cum_sel_np
            at_start = int(c[min(start - 1, len(c) - 1)]) if start > 0 else 0
            at_end = int(c[min(end - 1, len(c) - 1)]) if end > 0 else 0
            if at_start < 2 <= at_end:
                return False
        return True

    def init_cache(self, batch: int, max_len: int, dtype=jnp.float32):
        from image2text_tpu.models.kv_cache import KVCache

        shapes = [blk.cache_shape(batch, max_len) for blk in self.blocks]
        return KVCache.create(shapes, dtype)

    @property
    def block_size(self) -> int:
        return self.config.block_size

    @property
    def n_embd(self) -> int:
        return self.config.transformer_config.attn_config.n_embd
