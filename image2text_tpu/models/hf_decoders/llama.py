"""First-party JAX Llama-2 / Qwen-2 decoder backbone with HF-checkpoint
import (reference wraps HF AutoModelForCausalLM: models/decoder.py:384-440).

One implementation covers both families — RMSNorm pre-norm blocks, rotary
attention with grouped KV heads, SwiGLU MLP; Qwen-2 differs only in QKV
biases, rope theta, and (for the 1.5B distill) tied word embeddings.
Parameter tree mirrors HF ``model.*``/``lm_head`` names exactly.  Neither
family supports cross-attention (the reference raises for it —
decoder.py:303-315); conditioning is soft-prompt only.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Mapping, Optional

import jax
import jax.numpy as jnp
import numpy as np

from image2text_tpu.nn.core import Ctx, Module, ModuleList, normal_init, \
    sp_constrain
from image2text_tpu.nn.modules import Embedding, Linear
from image2text_tpu.ops.attention import causal_bias, sdpa
from image2text_tpu.models.hf_decoders.common import (
    RMSNorm,
    apply_rope,
    rope_cos_sin,
)
from image2text_tpu.utils.tree import flatten, unflatten


@dataclass
class LlamaArch:
    vocab_size: int
    n_layer: int
    n_embd: int
    n_head: int
    n_kv_head: int
    intermediate: int
    max_positions: int
    rope_theta: float = 10000.0
    rms_eps: float = 1e-5
    qkv_bias: bool = False        # True for Qwen-2
    tie_embeddings: bool = False  # True for Qwen-2 1.5B

    @property
    def head_dim(self) -> int:
        return self.n_embd // self.n_head


class _LlamaAttention(Module):
    def __init__(self, arch: LlamaArch):
        super().__init__()
        a = arch
        hd = a.head_dim
        self.arch = a
        self.q_proj = self.add("q_proj", Linear(a.n_embd, a.n_head * hd,
                                                bias=a.qkv_bias))
        self.k_proj = self.add("k_proj", Linear(a.n_embd, a.n_kv_head * hd,
                                                bias=a.qkv_bias))
        self.v_proj = self.add("v_proj", Linear(a.n_embd, a.n_kv_head * hd,
                                                bias=a.qkv_bias))
        self.o_proj = self.add("o_proj", Linear(a.n_head * hd, a.n_embd,
                                                bias=False))

    def kv_shape(self, batch: int, max_len: int):
        a = self.arch
        return (batch, a.n_kv_head, max_len, a.head_dim)

    def forward(self, p, x, positions, ctx: Ctx = Ctx(), use_flash: bool = True,
                kv_cache=None, **kwargs):
        a = self.arch
        b, t, _ = x.shape
        hd = a.head_dim

        def heads(z, n):
            return z.reshape(b, t, n, hd).transpose(0, 2, 1, 3)

        q = heads(self.q_proj(p["q_proj"], x), a.n_head)
        k = heads(self.k_proj(p["k_proj"], x), a.n_kv_head)
        v = heads(self.v_proj(p["v_proj"], x), a.n_kv_head)
        cos, sin = rope_cos_sin(positions, hd, a.rope_theta, x.dtype)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)

        if kv_cache is not None:
            k, v, mask = kv_cache.update(k, v, None)
            causal = False
        else:
            mask, causal = None, True
        # grouped-query KV goes to sdpa as-is: its head fold (query heads
        # into the sequence axis, HF repeat_kv grouping q head i -> kv head
        # i // rep) reads K/V once instead of materialising an
        # n_head/n_kv_head-way copy of the cache every decode step
        y = sdpa(q, k, v, mask=mask, ctx=ctx, use_flash=use_flash,
                 causal=causal)
        y = y.transpose(0, 2, 1, 3).reshape(b, t, a.n_head * hd)
        return self.o_proj(p["o_proj"], y)


class _LlamaMLP(Module):
    def __init__(self, arch: LlamaArch):
        super().__init__()
        self.gate_proj = self.add("gate_proj", Linear(arch.n_embd,
                                                      arch.intermediate,
                                                      bias=False))
        self.up_proj = self.add("up_proj", Linear(arch.n_embd,
                                                  arch.intermediate,
                                                  bias=False))
        self.down_proj = self.add("down_proj", Linear(arch.intermediate,
                                                      arch.n_embd, bias=False))

    def forward(self, p, x, **kwargs):
        return self.down_proj(
            p["down_proj"],
            jax.nn.silu(self.gate_proj(p["gate_proj"], x))
            * self.up_proj(p["up_proj"], x))


class _LlamaBlock(Module):
    def __init__(self, arch: LlamaArch):
        super().__init__()
        self.input_layernorm = self.add(
            "input_layernorm", RMSNorm(arch.n_embd, arch.rms_eps))
        self.self_attn = self.add("self_attn", _LlamaAttention(arch))
        self.post_attention_layernorm = self.add(
            "post_attention_layernorm", RMSNorm(arch.n_embd, arch.rms_eps))
        self.mlp = self.add("mlp", _LlamaMLP(arch))

    def forward(self, p, x, positions, ctx: Ctx = Ctx(), use_flash: bool = True,
                kv_cache=None, **kwargs):
        x = sp_constrain(self, x, ctx, kv_cache)
        x = x + self.self_attn(
            p["self_attn"], self.input_layernorm(p["input_layernorm"], x),
            positions, ctx=ctx.fold(1), use_flash=use_flash, kv_cache=kv_cache)
        x = x + self.mlp(
            p["mlp"], self.post_attention_layernorm(
                p["post_attention_layernorm"], x))
        return sp_constrain(self, x, ctx, kv_cache)


class LlamaBackbone(Module):
    """``model.*`` subtree of LlamaForCausalLM / Qwen2ForCausalLM."""

    def __init__(self, arch: LlamaArch):
        super().__init__()
        self.arch = arch
        self.embed_tokens = self.add(
            "embed_tokens", Embedding(arch.vocab_size, arch.n_embd,
                                      init_std=0.02))
        blocks = ModuleList([_LlamaBlock(arch) for _ in range(arch.n_layer)])
        self.blocks = self.add("layers", blocks)
        self.norm = self.add("norm", RMSNorm(arch.n_embd, arch.rms_eps))

    def forward(self, p, inputs_embeds, ctx: Ctx = Ctx(), use_flash: bool = True,
                kv_cache=None, pos_offset=None, **kwargs):
        t = inputs_embeds.shape[-2]
        positions = jnp.arange(t) if pos_offset is None \
            else pos_offset + jnp.arange(t)
        x = inputs_embeds
        # per-block remat (reference decoder.py:324-325); never in decode
        remat = (getattr(self, "enable_gradient_checkpointing", False)
                 and ctx.train and kv_cache is None)
        for depth, blk in enumerate(self.blocks):
            if remat:
                def run(bp_, x_, pos_, rng_, blk_=blk):
                    return blk_(bp_, x_, pos_, ctx=Ctx(rng=rng_, train=True),
                                use_flash=use_flash)
                x = jax.checkpoint(
                    run, policy=getattr(self, "_remat_policy", None))(
                        p["layers"][str(depth)], x, positions,
                        ctx.fold(depth).rng)
            else:
                x = blk(p["layers"][str(depth)], x, positions,
                        ctx=ctx.fold(depth), use_flash=use_flash,
                        kv_cache=kv_cache)
        return self.norm(p["norm"], x)


def import_hf_llama(params: Dict, sd: Mapping[str, np.ndarray],
                    loose: bool = False, tie_embeddings: bool = False) -> Dict:
    """HF Llama/Qwen ``state_dict`` → our tree (weights are plain Linear
    layout in HF; no transposes needed)."""
    flat = flatten(params)
    for k, v in sd.items():
        if k.endswith("rotary_emb.inv_freq"):
            continue
        v = np.asarray(v)
        if k == "lm_head.weight" and tie_embeddings:
            k = "model.embed_tokens.weight"
        if k not in flat:
            if not loose:
                raise ValueError(f"{k} is not present in state dict!!!")
            continue
        from image2text_tpu.models.quantization import assign_imported

        if assign_imported(flat, k, v):
            pass
        elif k in ("model.embed_tokens.weight", "lm_head.weight") \
                and flat[k].shape[0] >= v.shape[0] \
                and flat[k].shape[1] == v.shape[1]:
            flat[k] = flat[k].at[: v.shape[0]].set(jnp.asarray(v))
        elif not loose:
            raise ValueError(f"{k} is not the same shape in state dict!!!")
    return unflatten(flat)
