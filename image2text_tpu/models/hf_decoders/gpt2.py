"""First-party JAX GPT-2 decoder with HF-checkpoint import
(reference wraps HF GPT2LMHeadModel: models/decoder.py:285-381).

Parameter tree mirrors HF ``GPT2LMHeadModel`` state-dict names exactly
(Conv1D weights stored transposed into Linear layout at import), including
the cross-attention modules HF adds under ``add_cross_attention=True``:
``crossattention.{q_attn,c_attn,c_proj}`` + ``ln_cross_attn``.  lm_head is
weight-tied to wte (HF ``_tied_weights_keys``).
"""
from __future__ import annotations

from typing import Dict, Mapping, Optional

import jax
import jax.numpy as jnp
import numpy as np

from image2text_tpu.nn.core import (
    Ctx,
    Module,
    ModuleList,
    dropout,
    normal_init,
    sp_constrain,
)
from image2text_tpu.nn.modules import (
    Embedding,
    LayerNorm,
    Linear,
    QuantizedKV,
    gelu_tanh,
    quantize_rows_int8,
)
from image2text_tpu.ops.attention import causal_bias, sdpa
from image2text_tpu.utils.tree import flatten, unflatten


class _GPT2SelfAttention(Module):
    def __init__(self, n_embd: int, n_head: int, dropout_rate: float):
        super().__init__()
        self.n_head = n_head
        self.n_embd = n_embd
        self.dropout_rate = dropout_rate
        self.c_attn = self.add("c_attn", Linear(n_embd, 3 * n_embd))
        self.c_proj = self.add("c_proj", Linear(n_embd, n_embd))

    def kv_shape(self, batch: int, max_len: int):
        return (batch, self.n_head, max_len, self.n_embd // self.n_head)

    def forward(self, p, x, ctx: Ctx = Ctx(), use_flash: bool = True,
                kv_cache=None, **kwargs):
        b, t, c = x.shape
        hd = c // self.n_head
        q, k, v = jnp.split(self.c_attn(p["c_attn"], x), 3, axis=-1)

        def heads(z):
            return z.reshape(b, t, self.n_head, hd).transpose(0, 2, 1, 3)

        q, k, v = heads(q), heads(k), heads(v)
        if kv_cache is not None:
            k, v, mask = kv_cache.update(k, v, None)
            causal = False
        else:
            mask, causal = None, True
        y = sdpa(q, k, v, mask=mask, ctx=ctx, use_flash=use_flash,
                 causal=causal)
        y = y.transpose(0, 2, 1, 3).reshape(b, t, c)
        y = self.c_proj(p["c_proj"], y)
        y, _ = dropout(y, self.dropout_rate, ctx.fold(1))
        return y


class _GPT2CrossAttention(Module):
    """HF GPT2Attention(is_cross_attention=True): q from hidden (q_attn),
    k/v from encoder states (c_attn, fused 2×), no causal mask."""

    def __init__(self, n_embd: int, n_head: int, dropout_rate: float):
        super().__init__()
        self.n_head = n_head
        self.n_embd = n_embd
        self.dropout_rate = dropout_rate
        self.q_attn = self.add("q_attn", Linear(n_embd, n_embd))
        self.c_attn = self.add("c_attn", Linear(n_embd, 2 * n_embd))
        self.c_proj = self.add("c_proj", Linear(n_embd, n_embd))

    def project_kv(self, p, enc, quant=None):
        """Split-head cross K/V for a fixed encoder output (decode-time
        precompute — once per sequence, not once per token).

        ``quant='int8'`` returns a :class:`nn.modules.QuantizedKV` —
        stored int8 + per-row scales, dequantized on read in ``forward``
        (halves the per-step cross-K/V HBM read; the scratch decoder's
        MultiheadAttention additionally runs native int8 dots)."""
        b = enc.shape[0]
        hd = self.n_embd // self.n_head
        k, v = jnp.split(self.c_attn(p["c_attn"], enc), 2, axis=-1)

        def heads(z):
            return z.reshape(b, -1, self.n_head, hd).transpose(0, 2, 1, 3)

        k, v = heads(k), heads(v)
        if quant == "int8":
            kq, ks = quantize_rows_int8(k)
            vq, vs = quantize_rows_int8(v)
            return QuantizedKV(kq, ks, vq, vs)
        assert quant is None, f"unknown cross-KV quant mode {quant!r}"
        return k, v

    def forward(self, p, x, enc, ctx: Ctx = Ctx(), use_flash: bool = True,
                precomputed_kv=None, **kwargs):
        b, t, c = x.shape
        hd = c // self.n_head
        q = self.q_attn(p["q_attn"], x)
        if isinstance(precomputed_kv, QuantizedKV):
            # dequant-on-read: only 1-byte K/V rows cross HBM; the convert
            # happens in VMEM and fuses into the attention dots
            kq, ks, vq, vs = precomputed_kv
            k = (kq * ks[..., None]).astype(x.dtype)
            v = (vq * vs[..., None]).astype(x.dtype)
        elif precomputed_kv is not None:
            k, v = precomputed_kv
        else:
            k, v = self.project_kv(p, enc)

        def heads(z):
            return z.reshape(b, -1, self.n_head, hd).transpose(0, 2, 1, 3)

        y = sdpa(heads(q), k, v, mask=None, ctx=ctx,
                 use_flash=use_flash)
        y = y.transpose(0, 2, 1, 3).reshape(b, t, c)
        y = self.c_proj(p["c_proj"], y)
        y, _ = dropout(y, self.dropout_rate, ctx.fold(1))
        return y


class _GPT2MLP(Module):
    def __init__(self, n_embd: int, n_inner: int, dropout_rate: float):
        super().__init__()
        self.c_fc = self.add("c_fc", Linear(n_embd, n_inner))
        self.c_proj = self.add("c_proj", Linear(n_inner, n_embd))
        self.dropout_rate = dropout_rate

    def forward(self, p, x, ctx: Ctx = Ctx(), **kwargs):
        h = self.c_proj(p["c_proj"], gelu_tanh(self.c_fc(p["c_fc"], x)))
        h, _ = dropout(h, self.dropout_rate, ctx)
        return h


class _GPT2Block(Module):
    def __init__(self, n_embd: int, n_head: int, dropout_rate: float,
                 cross_attn: bool, ln_eps: float = 1e-5):
        super().__init__()
        self.ln_1 = self.add("ln_1", LayerNorm(n_embd, bias=True, eps=ln_eps))
        self.attn = self.add("attn", _GPT2SelfAttention(n_embd, n_head,
                                                        dropout_rate))
        self.has_cross = cross_attn
        if cross_attn:
            self.crossattention = self.add(
                "crossattention", _GPT2CrossAttention(n_embd, n_head,
                                                      dropout_rate))
            self.ln_cross_attn = self.add(
                "ln_cross_attn", LayerNorm(n_embd, bias=True, eps=ln_eps))
        self.ln_2 = self.add("ln_2", LayerNorm(n_embd, bias=True, eps=ln_eps))
        self.mlp = self.add("mlp", _GPT2MLP(n_embd, 4 * n_embd, dropout_rate))

    def forward(self, p, x, enc=None, ctx: Ctx = Ctx(), use_flash: bool = True,
                kv_cache=None, cross_kv=None, **kwargs):
        x = sp_constrain(self, x, ctx, kv_cache)
        x = x + self.attn(p["attn"], self.ln_1(p["ln_1"], x), ctx=ctx.fold(1),
                          use_flash=use_flash, kv_cache=kv_cache)
        if enc is not None or cross_kv is not None:
            assert self.has_cross, "cross-attention not configured"
            x = x + self.crossattention(
                p["crossattention"], self.ln_cross_attn(p["ln_cross_attn"], x),
                enc, ctx=ctx.fold(2), use_flash=use_flash,
                precomputed_kv=cross_kv)
        x = x + self.mlp(p["mlp"], self.ln_2(p["ln_2"], x), ctx=ctx.fold(3))
        return sp_constrain(self, x, ctx, kv_cache)


class GPT2Backbone(Module):
    """transformer.* subtree of GPT2LMHeadModel."""

    def __init__(self, vocab_size: int, n_layer: int, n_embd: int,
                 n_head: int, n_positions: int, dropout_rate: float,
                 cross_attn: bool):
        super().__init__()
        self.n_positions = n_positions
        self.dropout_rate = dropout_rate
        self.wte = self.add("wte", Embedding(vocab_size, n_embd,
                                             init_std=0.02))
        self.wpe = self.add("wpe", Embedding(n_positions, n_embd,
                                             init_std=0.02))
        blocks = ModuleList([
            _GPT2Block(n_embd, n_head, dropout_rate, cross_attn)
            for _ in range(n_layer)])
        self.blocks = self.add("h", blocks)
        self.ln_f = self.add("ln_f", LayerNorm(n_embd, bias=True))

    def forward(self, p, inputs_embeds, enc=None, ctx: Ctx = Ctx(),
                use_flash: bool = True, kv_cache=None, pos_offset=None,
                cross_kv=None, **kwargs):
        t = inputs_embeds.shape[-2]
        positions = jnp.arange(t) if pos_offset is None \
            else pos_offset + jnp.arange(t)
        # through the Embedding module, which also serves the W8A8 form
        x = inputs_embeds + self.wpe(p["wpe"], positions) \
            .astype(inputs_embeds.dtype)
        x, ctx = dropout(x, self.dropout_rate, ctx)
        # per-block remat (reference decoder.py:324-325 enables HF gradient
        # checkpointing); decode (kv_cache) and eval never remat
        remat = (getattr(self, "enable_gradient_checkpointing", False)
                 and ctx.train and kv_cache is None)
        for depth, blk in enumerate(self.blocks):
            ckv = cross_kv.get(depth) if cross_kv is not None else None
            bctx = ctx.fold(depth)
            if remat:
                def run(bp_, x_, enc_, rng_, blk_=blk):
                    return blk_(bp_, x_, enc=enc_,
                                ctx=Ctx(rng=rng_, train=True),
                                use_flash=use_flash)
                x = jax.checkpoint(
                    run, policy=getattr(self, "_remat_policy", None))(
                        p["h"][str(depth)], x, enc, bctx.rng)
            else:
                x = blk(p["h"][str(depth)], x,
                        enc=None if ckv is not None else enc, ctx=bctx,
                        use_flash=use_flash, kv_cache=kv_cache, cross_kv=ckv)
        return self.ln_f(p["ln_f"], x)


GPT2_HF_TRANSPOSED = (
    "attn.c_attn.weight", "attn.c_proj.weight",
    "crossattention.c_attn.weight", "crossattention.q_attn.weight",
    "crossattention.c_proj.weight",
    "mlp.c_fc.weight", "mlp.c_proj.weight",
)


def import_hf_gpt2(params: Dict, sd: Mapping[str, np.ndarray],
                   loose: bool = False) -> Dict:
    """HF GPT2LMHeadModel state dict → our tree (Conv1D transposes; vocab
    may have grown via extra_tokens — new rows keep their init)."""
    flat = flatten(params)
    for k, v in sd.items():
        if k.endswith(".attn.masked_bias") or k.endswith(".attn.bias") \
                or k.endswith(".crossattention.masked_bias") \
                or k.endswith(".crossattention.bias"):
            continue
        v = np.asarray(v)
        if any(k.endswith(s) for s in GPT2_HF_TRANSPOSED):
            v = v.T
        if k == "lm_head.weight":
            k = "transformer.wte.weight"
        if k not in flat:
            if not loose:
                raise ValueError(f"{k} is not present in state dict!!!")
            continue
        from image2text_tpu.models.quantization import assign_imported

        if assign_imported(flat, k, v):
            pass
        elif k == "transformer.wte.weight" \
                and flat[k].shape[0] >= v.shape[0] \
                and flat[k].shape[1] == v.shape[1]:
            flat[k] = flat[k].at[: v.shape[0]].set(jnp.asarray(v))
        elif not loose:
            raise ValueError(f"{k} is not the same shape in state dict!!!")
    return unflatten(flat)
