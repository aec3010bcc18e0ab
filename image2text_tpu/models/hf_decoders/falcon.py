"""First-party JAX Falcon-7B decoder backbone with HF-checkpoint import
(reference wraps HF FalconForCausalLM: models/decoder.py:384-401).

Falcon-7B architecture (HF ``new_decoder_architecture=False``,
``parallel_attn=True``, ``multi_query=True``, no linear biases): a single
pre-LN feeds BOTH the attention and the MLP in parallel
(x + attn(ln(x)) + mlp(ln(x))), rotary positions, one shared KV head.
Parameter tree mirrors HF ``transformer.*``/``lm_head`` names; lm_head is
weight-tied to word_embeddings (HF ``_tied_weights_keys``).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Mapping

import jax
import jax.numpy as jnp
import numpy as np

from image2text_tpu.nn.core import Ctx, Module, ModuleList, sp_constrain
from image2text_tpu.nn.modules import Embedding, LayerNorm, Linear
from image2text_tpu.ops.attention import causal_bias, sdpa
from image2text_tpu.models.hf_decoders.common import apply_rope, rope_cos_sin
from image2text_tpu.utils.tree import flatten, unflatten


@dataclass
class FalconArch:
    vocab_size: int
    n_layer: int
    n_embd: int
    n_head: int
    max_positions: int = 2048
    rope_theta: float = 10000.0
    ln_eps: float = 1e-5

    @property
    def head_dim(self) -> int:
        return self.n_embd // self.n_head


class _FalconAttention(Module):
    """Fused QKV with one shared KV head (multi_query)."""

    def __init__(self, arch: FalconArch):
        super().__init__()
        a = arch
        self.arch = a
        self.query_key_value = self.add(
            "query_key_value",
            Linear(a.n_embd, a.n_embd + 2 * a.head_dim, bias=False))
        self.dense = self.add("dense", Linear(a.n_embd, a.n_embd, bias=False))

    def kv_shape(self, batch: int, max_len: int):
        return (batch, 1, max_len, self.arch.head_dim)

    def forward(self, p, x, positions, ctx: Ctx = Ctx(), use_flash: bool = True,
                kv_cache=None, **kwargs):
        a = self.arch
        b, t, _ = x.shape
        hd = a.head_dim
        qkv = self.query_key_value(p["query_key_value"], x)
        q = qkv[..., : a.n_embd].reshape(b, t, a.n_head, hd).transpose(0, 2, 1, 3)
        k = qkv[..., a.n_embd: a.n_embd + hd].reshape(b, t, 1, hd).transpose(0, 2, 1, 3)
        v = qkv[..., a.n_embd + hd:].reshape(b, t, 1, hd).transpose(0, 2, 1, 3)
        cos, sin = rope_cos_sin(positions, hd, a.rope_theta, x.dtype)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        if kv_cache is not None:
            k, v, mask = kv_cache.update(k, v, None)
            causal = False
        else:
            mask, causal = None, True
        y = sdpa(q, k, v, mask=mask, ctx=ctx, use_flash=use_flash,
                 causal=causal)
        y = y.transpose(0, 2, 1, 3).reshape(b, t, a.n_embd)
        return self.dense(p["dense"], y)


class _FalconMLP(Module):
    def __init__(self, arch: FalconArch):
        super().__init__()
        self.dense_h_to_4h = self.add(
            "dense_h_to_4h", Linear(arch.n_embd, 4 * arch.n_embd, bias=False))
        self.dense_4h_to_h = self.add(
            "dense_4h_to_h", Linear(4 * arch.n_embd, arch.n_embd, bias=False))

    def forward(self, p, x, **kwargs):
        return self.dense_4h_to_h(
            p["dense_4h_to_h"],
            jax.nn.gelu(self.dense_h_to_4h(p["dense_h_to_4h"], x),
                        approximate=False))


class _FalconBlock(Module):
    def __init__(self, arch: FalconArch):
        super().__init__()
        self.input_layernorm = self.add(
            "input_layernorm", LayerNorm(arch.n_embd, bias=True,
                                         eps=arch.ln_eps))
        self.self_attention = self.add("self_attention",
                                       _FalconAttention(arch))
        self.mlp = self.add("mlp", _FalconMLP(arch))

    def forward(self, p, x, positions, ctx: Ctx = Ctx(), use_flash: bool = True,
                kv_cache=None, **kwargs):
        x = sp_constrain(self, x, ctx, kv_cache)
        ln = self.input_layernorm(p["input_layernorm"], x)
        attn_out = self.self_attention(p["self_attention"], ln, positions,
                                       ctx=ctx.fold(1), use_flash=use_flash,
                                       kv_cache=kv_cache)
        mlp_out = self.mlp(p["mlp"], ln)   # parallel_attn: same ln input
        return sp_constrain(self, x + attn_out + mlp_out, ctx, kv_cache)


class FalconBackbone(Module):
    """``transformer.*`` subtree of FalconForCausalLM."""

    def __init__(self, arch: FalconArch):
        super().__init__()
        self.arch = arch
        self.word_embeddings = self.add(
            "word_embeddings", Embedding(arch.vocab_size, arch.n_embd,
                                         init_std=0.02))
        blocks = ModuleList([_FalconBlock(arch) for _ in range(arch.n_layer)])
        self.blocks = self.add("h", blocks)
        self.ln_f = self.add("ln_f", LayerNorm(arch.n_embd, bias=True,
                                               eps=arch.ln_eps))

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
                        p["h"][str(depth)], x, positions,
                        ctx.fold(depth).rng)
            else:
                x = blk(p["h"][str(depth)], x, positions, ctx=ctx.fold(depth),
                        use_flash=use_flash, kv_cache=kv_cache)
        return self.ln_f(p["ln_f"], x)


def import_hf_falcon(params: Dict, sd: Mapping[str, np.ndarray],
                     loose: bool = False) -> Dict:
    flat = flatten(params)
    for k, v in sd.items():
        v = np.asarray(v)
        if k == "lm_head.weight":
            k = "transformer.word_embeddings.weight"  # tied storage
        if k not in flat:
            if not loose:
                raise ValueError(f"{k} is not present in state dict!!!")
            continue
        from image2text_tpu.models.quantization import assign_imported

        if assign_imported(flat, k, v):
            pass
        elif k == "transformer.word_embeddings.weight" \
                and flat[k].shape[0] >= v.shape[0] \
                and flat[k].shape[1] == v.shape[1]:
            flat[k] = flat[k].at[: v.shape[0]].set(jnp.asarray(v))
        elif not loose:
            raise ValueError(f"{k} is not the same shape in state dict!!!")
    return unflatten(flat)
