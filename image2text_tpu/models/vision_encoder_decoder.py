"""Composite vision-encoder → causal-decoder model
(reference: models/vision_encoder_decoder.py).

Conditioning modes (composable, ≥1 required):

* **soft prompting** — encoder CLS outputs are prepended to the token
  embeddings; the attention bias reproduces the reference's semantics
  exactly (vision_encoder_decoder.py:84-111): prefix *queries* attend
  everywhere (subject to per-block causality), while text queries attend
  only the text block.  Image information reaches text positions through
  cross-attention (or, for HF decoders, through their plain-causal mask).
* **cross attention** — encoder outputs feed the decoder blocks' cross
  attention (even depths only under ``skip_alternate_cross_attn``).

All masks here are additive fp32 biases with static shapes — the jit-able
reformulation of the reference's dynamic bool-mask surgery.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from image2text_tpu.configs.models import VisionEncoderDecoderConfig
from image2text_tpu.nn.core import Ctx, Module
from image2text_tpu.nn.modules import Linear
from image2text_tpu.models.decoder import Decoder
from image2text_tpu.models.encoder import Encoder
from image2text_tpu.object_models import VisionEncoderDecoderModelOutput

NEG_INF = float("-inf")


class _EncoderWithBridge(Module):
    """nn.Sequential(encoder, Linear) analog — children '0'/'1' keep the
    reference's checkpoint paths (vision_encoder_decoder.py:33-37)."""

    def __init__(self, encoder: Encoder, bridge: Linear):
        super().__init__()
        self.enc = self.add("0", encoder)
        self.bridge = self.add("1", bridge)

    def forward(self, p, images, ctx: Ctx = Ctx(), **kwargs):
        return self.bridge(p["1"], self.enc(p["0"], images, ctx=ctx))


class VisionEncoderDecoder(Module):
    """Encoder-decoder model for conditional caption generation."""

    def __init__(self, config: VisionEncoderDecoderConfig,
                 encoder: Optional[Encoder] = None,
                 decoder: Optional[Decoder] = None):
        super().__init__()
        self.config = config
        encoder = encoder if encoder is not None \
            else Encoder.from_config(config.vision_encoder_config)
        self.space_for_prompt = encoder.num_outputs if config.use_soft_prompting else 0
        self.decoder = decoder if decoder is not None else Decoder.from_config(
            config=config.decoder_config,
            loose=config.loose_match_decoder_state_dict,
            space_for_prompt=self.space_for_prompt)
        self.add("decoder", self.decoder)
        self._inner_encoder = encoder
        if encoder.output_embed_dim != self.decoder.n_embd:
            self.encoder = _EncoderWithBridge(
                encoder, Linear(encoder.output_embed_dim, self.decoder.n_embd,
                                bias=False))
        else:
            self.encoder = encoder
        self.add("encoder", self.encoder)
        self.no_repeat_n_grams = tuple(config.no_repeat_n_grams)
        self.use_cross_attn = config.use_cross_attn
        self.use_soft_prompting = config.use_soft_prompting
        if not (self.use_cross_attn or self.use_soft_prompting):
            raise ValueError(
                "Misconfigured!!! Need to either use cross attn or soft "
                "prompting or both")
        self.chkpt_path = config.chkpt_path

    # -- init with optional partial-checkpoint restore -----------------------
    def init(self, key, path: str = ""):
        params = super().init(key, path)
        if self.chkpt_path is not None:
            from image2text_tpu.utils.checkpoint import (
                update_params_from_partial_checkpoint,
            )
            params = update_params_from_partial_checkpoint(self, params,
                                                           self.chkpt_path)
        return params

    # -- mask construction ----------------------------------------------------
    # Reference-exact semantics (vision_encoder_decoder.py:61-120): although
    # the reference normalises the provided bool mask and ANDs in a causal
    # tril, its bool→additive conversion
    # ``attn_msk.masked_fill(~attn_msk, -inf)`` runs on a BOOL tensor — the
    # -inf fill casts to True, the ``.float()``/``== 1 → 0`` pass then zeroes
    # the whole block — so the provided mask AND the composite tril are
    # silently discarded.  The behaviour that actually ships (and that its
    # trainer — which passes the padding mask, wrapper.py:199 — trains with):
    #
    # * causality comes ONLY from the blocks' internal ``is_causal`` masks;
    # * under soft prompting, prefix query rows are open, text→prefix is
    #   blocked (-inf), and the text block is fully open;
    # * without soft prompting the decoder receives no mask at all.
    def forward(self, p, images, ids, attn_msk=None, encoder_output=None,
                ctx: Ctx = Ctx(), use_flash: bool = True,
                sparse_rule_len=None):
        if encoder_output is None:
            encoder_output = self.encoder(p["encoder"], images, ctx=ctx.fold(1))
        s = ids.shape[-1]
        del attn_msk  # accepted for API parity; ignored, as in the reference

        block_size = self.decoder.block_size
        if self.use_soft_prompting:
            inputs_embeds = jnp.concatenate(
                [encoder_output,
                 self.decoder.get_inputs_embeds(p["decoder"], ids).astype(
                     encoder_output.dtype)],
                axis=-2)[..., :block_size, :]
            ncls = encoder_output.shape[-2]
            total = ncls + s
            # additive bias (1, 1, total, total): -inf text→prefix, prefix
            # query rows and the text block fully open (broadcasts over bs/h)
            bias = jnp.full((1, 1, total, total), NEG_INF, jnp.float32)
            bias = bias.at[..., :ncls, :].set(0.0)
            bias = bias.at[..., ncls:, ncls:].set(0.0)
            attn_bias = bias[..., :block_size, :block_size]
            dec_ids = None
            offset = ncls
        else:
            inputs_embeds = None
            dec_ids = ids
            offset = 0
            attn_bias = None

        cross_attn_values = encoder_output if self.use_cross_attn else None
        # sparse_rule_len: the VALID current length of the decoder-input
        # sequence in block coordinates (soft-prompt prefix included) —
        # generation fallbacks pass it so sparse blocks evaluate the
        # reference's global bypass rule at the generated length rather
        # than at the padded buffer length (see models/layers.py)
        logits, hidden_state = self.decoder(
            p["decoder"], idx=dec_ids, inputs_embeds=inputs_embeds,
            cross_attn_embeds=cross_attn_values, attn_msk=attn_bias,
            ctx=ctx.fold(2), use_flash=use_flash,
            sparse_rule_len=sparse_rule_len)
        return VisionEncoderDecoderModelOutput(
            encoder_output=encoder_output,
            logits=logits[..., offset:, :],
            hidden_state=hidden_state,
        )

    # -- generation -----------------------------------------------------------
    def generate(self, p, images, prompt_ids, max_new_tokens: int = 128,
                 temperature: float = 1.0, top_k: Optional[int] = None,
                 nucleus_p: Optional[float] = None,
                 rng: Optional[jax.Array] = None, **kwargs):
        """On-device autoregressive sampling (greedy/top-k/nucleus with
        no-repeat-ngram processors).  See models/generation.py."""
        from image2text_tpu.models.generation import generate as _generate

        return _generate(self, p, images, prompt_ids,
                         max_new_tokens=max_new_tokens, temperature=temperature,
                         top_k=top_k, nucleus_p=nucleus_p, rng=rng, **kwargs)
