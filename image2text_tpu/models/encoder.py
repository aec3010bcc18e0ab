"""Vision encoders (reference: models/encoder.py).

Two families, selected by config union member:

* :class:`VisionTransformerEncoder` — from-scratch ViT with ConvMLP feature
  extraction and learned CLS summary tokens (encoder.py:130-195).
* :class:`PretrainedViT` — frozen-or-finetuned ViT-B/16 backbone with one of
  three projection heads: per-position residual MLP, PEER product-key
  memory, or per-CLS LSH embedding stacks (encoder.py:56-127).

Gradient checkpointing maps to ``jax.checkpoint`` per block; the reference's
``refine_base_model=False`` no_grad wrapper maps to ``lax.stop_gradient``.
"""
from __future__ import annotations

import math
import os
from typing import Union

import jax
import jax.numpy as jnp
import numpy as np

from image2text_tpu.ops.static_gather import layout_rows, static_take
from image2text_tpu.configs.models import (
    PretrainedViTConfig,
    VisionTransformerEncoderConfig,
)
from image2text_tpu.nn.core import Ctx, Module, ModuleList, dropout, normal_init
from image2text_tpu.nn.modules import LayerNorm, LayerNormND, Linear
from image2text_tpu.models.layers import (
    AdvancedPositionalBiasMLP,
    CompositeCosineVectorEmbedding,
    ConvMLP,
    PeerLookup,
    TransformerBlock,
)
from image2text_tpu.models.vit import VisionTransformerB16

# kwargs override for the PretrainedViT backbone (see PretrainedViT)
VIT_B16_ARGS: dict = {}


def _l2_normalize(x, axis=-1, eps=1e-12):
    return x / (jnp.linalg.norm(x, axis=axis, keepdims=True) + eps)


class Encoder(Module):
    """Base class: forward(p, images) -> (b, num_outputs, output_embed_dim)."""

    @classmethod
    def from_config(cls, config: Union[VisionTransformerEncoderConfig,
                                       PretrainedViTConfig]) -> "Encoder":
        if isinstance(config, PretrainedViTConfig):
            model = PretrainedViT(config)
            if config.lora_spec is not None:
                from image2text_tpu.models.lora import apply_lora
                model = apply_lora(model, config.lora_spec)
            return model
        if isinstance(config, VisionTransformerEncoderConfig):
            # LoRA is only sensible on pretrained weights (silently skipped,
            # matching reference encoder.py:35-45)
            return VisionTransformerEncoder(config)
        raise ValueError("Unknown config")

    @property
    def num_outputs(self) -> int:
        raise NotImplementedError

    @property
    def output_embed_dim(self) -> int:
        raise NotImplementedError


class PretrainedViT(Encoder):
    """ViT-B/16 backbone + configurable projection head (encoder.py:56-127)."""

    def __init__(self, config: PretrainedViTConfig):
        super().__init__()
        self.config = config
        self.out_dim = config.n_embd_out_vit
        self.n_cls = config.n_cls
        self.use_peer = config.peer_config is not None
        self.use_lsh = (not self.use_peer) and config.lsh_config is not None
        # VIT_B16_ARGS: test/tool hook (like hf_decoders.GPT2_TABLE) to
        # build a depth-reduced backbone for offline parity harnesses
        self.model = self.add("model", VisionTransformerB16(**VIT_B16_ARGS))
        # LSH head forces the backbone frozen (encoder.py:73)
        self.refine = config.refine_base_model if not self.use_lsh else False

        if not (self.use_lsh or self.use_peer):
            self.proj = self.add("proj", AdvancedPositionalBiasMLP(
                context_width=config.n_cls, in_features=768,
                out_features=config.n_embd_out_vit, gate_sizes=config.gate_sizes,
                add_residual_connection=True))
        else:
            self.proj = None

        if self.use_peer:
            pc = config.peer_config
            self.peer = self.add("peer", PeerLookup(
                768, config.n_embd_out_vit, pc.num_units_sqrt ** 2,
                pc.topk, pc.nhead, pc.query_dim))
            self.param("peer_proj_wt", (768, 768, self.n_cls),
                       normal_init(std=1.0 / math.sqrt(768)))
        else:
            self.peer = None
            # the reference registers a frozen dummy peer_proj_wt even on
            # the non-peer paths (reference encoder.py:88-93) — keep the
            # state-dict key so its checkpoints round-trip
            self.buffer("peer_proj_wt", np.zeros((1,), np.float32))

        if self.use_lsh:
            lc = config.lsh_config
            lsh = ModuleList([
                CompositeCosineVectorEmbedding(
                    768, config.n_embd_out_vit, lc.num_bins, lc.num_proj,
                    lc.learnable, seed=i)
                for i in range(self.n_cls)
            ])
            self.lsh_emb = self.add("lsh_emb", lsh)
        else:
            self.lsh_emb = None

    def frozen_param_paths(self, path: str = ""):
        out = super().frozen_param_paths(path)
        if not self.refine:
            # refine_base_model=False stop-gradients the backbone (forward
            # below); torch leaves those p.grad None so AdamW never touches
            # them — freeze explicitly so the optimizer's decoupled weight
            # decay cannot shrink the "frozen" backbone either
            prefix = f"{path}.model" if path else "model"
            out.extend(self.model.param_specs(prefix))
        return out

    def forward(self, p, images, ctx: Ctx = Ctx(), **kwargs):
        x = self.model(p["model"], images, ctx=ctx.fold(1))
        if not self.refine:
            x = jax.lax.stop_gradient(x)
        if self.use_peer:
            z = jnp.einsum("bd,des->bse", x, p["peer_proj_wt"].astype(x.dtype),
                           preferred_element_type=jnp.float32).astype(x.dtype)
            return self.peer(p["peer"], z, ctx=ctx.fold(2))
        if self.use_lsh:
            outs = [mod(p["lsh_emb"][str(i)], x, ctx=ctx.fold(10 + i))
                    for i, mod in enumerate(self.lsh_emb)]
            return jnp.stack(outs, axis=1)
        x = _l2_normalize(x)
        x = jnp.broadcast_to(x[:, None, :], (x.shape[0], self.n_cls, x.shape[-1]))
        return _l2_normalize(self.proj(p["proj"], x, ctx=ctx.fold(2)))

    @property
    def num_outputs(self) -> int:
        return self.n_cls

    @property
    def output_embed_dim(self) -> int:
        return self.out_dim


class VisionTransformerEncoder(Encoder):
    """From-scratch ViT with CLS summary tokens (encoder.py:130-195).

    The patch embedding keeps the reference's raw-reshape semantics
    (encoder.py:145,166): the ConvMLP feature map is flattened row-major
    into n_patches² tokens of dim C·pw·ph."""

    def __init__(self, config: VisionTransformerEncoderConfig):
        super().__init__()
        self.config = config
        n_patches = config.num_patches
        self.n_patches = n_patches
        assert config.input.width % n_patches == 0
        assert config.input.height % n_patches == 0
        self.patch_size = (config.input.width // n_patches,
                           config.input.height // n_patches)
        out_features = config.n_channels
        self.feature_extractor = self.add("feature_extractor", ConvMLP(
            config.input.n_channels, out_features,
            config.feature_extractor_kernel_size,
            config.feature_extractor_gate_sizes))
        self.input_d = out_features * self.patch_size[0] * self.patch_size[1]
        acfg = config.transformer_config.attn_config
        self.out_dim = acfg.n_embd
        self.projector = self.add("projector", Linear(
            self.input_d, self.out_dim, bias=acfg.bias))
        self.ln_input = self.add("ln_input", LayerNormND(
            (n_patches ** 2, self.out_dim), acfg.bias))
        transformer = Module()
        transformer.add("wpe", _WpeEmbedding(n_patches ** 2, self.out_dim))
        blocks = ModuleList([TransformerBlock(config.transformer_config, seed=depth)
                             for depth in range(config.n_layer)])
        transformer.add("h", blocks)
        transformer.add("ln_f", LayerNorm(self.out_dim, bias=acfg.bias))
        self.transformer = self.add("transformer", transformer)
        self.blocks = blocks
        self.dropout_rate = acfg.dropout
        self.param("cls_token", (1, config.n_cls, self.out_dim),
                   normal_init(std=1.0 / math.sqrt(self.out_dim)))
        self.n_cls = config.n_cls
        self.enable_gradient_checkpointing = config.enable_gradient_checkpointing

    def forward(self, p, images, ctx: Ctx = Ctx(), **kwargs):
        x = self.feature_extractor(p["feature_extractor"], images, ctx=ctx.fold(1))
        n = x.shape[0]
        x = x.reshape(n, self.n_patches ** 2, self.input_d)
        stream = None
        if not ctx.train and os.environ.get("GRAFT_FUSED_FRONTEND") == "1":
            # opt-in: projector + both LayerNormND passes + pos-emb + CLS
            # concat in one Pallas kernel (ops/fused_frontend.py).
            # Measured 3.12 vs 3.42 ms XLA at batch 256
            # (PROBE_FRONTEND.jsonl) but its Mosaic compile is MINUTES
            # through the tunnel (two bench runs blew their budgets) —
            # a 9% prelude gain cannot buy that cold-compile cost in the
            # serving path, so the XLA composition stays the default.
            # Kept as a tested, measured opt-in.
            from image2text_tpu.ops.fused_frontend import (
                fused_frontend_compatible)

            stream = fused_frontend_compatible(self, p, x)
        if stream is not None:
            x = stream  # dropout is an eval no-op on this path
        else:
            x = self.ln_input(p["ln_input"], self.projector(p["projector"], x))
            pos = jnp.arange(self.n_patches ** 2)
            wpe = self.transformer._children["wpe"]
            pos_emb = wpe(p["transformer"]["wpe"], pos)[None]
            y = x + pos_emb.astype(x.dtype)
            cls = jnp.broadcast_to(p["cls_token"].astype(x.dtype),
                                   (n, self.n_cls, self.out_dim))
            x = jnp.concatenate([cls, self.ln_input(p["ln_input"], y)], axis=1)
            x, ctx = dropout(x, self.dropout_rate, ctx)
        # lazy sparse layout: consecutive sparse blocks compose their static
        # gathers instead of reassembling canonical order per block (the
        # per-block combine permutation was 2.0-2.5 ms/block at batch 256,
        # PROFILE_ENC_BLOCK.json); `layout` is trace-time numpy bookkeeping
        layout = None
        for depth, blk in enumerate(self.blocks):
            bp = p["transformer"]["h"][str(depth)]
            bctx = ctx.fold(100 + depth)
            new_layout = blk.next_layout(layout, x.shape[1])
            if self.enable_gradient_checkpointing and ctx.train:
                def run(bp_, x_, rng_, blk_=blk, layout_=layout):
                    out = blk_(bp_, x_, ctx=Ctx(rng=rng_, train=True),
                               layout=layout_, want_lazy=True)
                    return out[0]
                x = jax.checkpoint(
                    run, policy=getattr(self, "_remat_policy", None))(
                        bp, x, bctx.rng)
            else:
                x = blk(bp, x, ctx=bctx, layout=layout, want_lazy=True)[0]
            layout = new_layout
        ln_f = self.transformer._children["ln_f"]
        if layout is None:
            cls = x[:, :self.n_cls]
        else:  # only the CLS rows ever need canonical reassembly
            cls = static_take(x, layout_rows(layout, np.arange(self.n_cls)))
        return ln_f(p["transformer"]["ln_f"], cls)

    @property
    def num_outputs(self) -> int:
        return self.n_cls

    @property
    def output_embed_dim(self) -> int:
        return self.out_dim


class _WpeEmbedding(Module):
    """Positional embedding table with torch nn.Embedding naming/init."""

    def __init__(self, num: int, dim: int):
        super().__init__()
        self.param("weight", (num, dim), normal_init(std=1.0))

    def forward(self, p, idx, **kwargs):
        return jnp.take(p["weight"], idx, axis=0)
