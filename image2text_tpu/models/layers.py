"""Layer/op library: the TPU-native re-design of the reference's layer zoo
(reference: models/layers.py).

Key departures from the torch implementation, for TPU-first execution:

* Attention uses additive fp32 masks + a shared SDPA op with an optional
  Pallas flash path (reference relies on torch SDPA CUDA kernels).
* MoE dispatch is dense-vectorized: all (low-rank) experts are evaluated as
  one stacked einsum and combined with top-k one-hot weights — static
  shapes, MXU-friendly — instead of the reference's boolean-mask Python
  loop (layers.py:343-345).
* Sparse attention keeps the reference's seeded PCG64 permutations
  (layers.py:551-558) but bakes the selected positions in as *static*
  gather indices, so XLA sees fixed shapes.
* AdvancedPositionalBiasMLP evaluates its per-position MLPs as one batched
  einsum over stacked weights instead of a Python loop over positions
  (layers.py:637-638).

Parameter tree paths reproduce the reference ``state_dict`` names exactly
(including torch.nn.Sequential index naming), so fnmatch-driven config
machinery and checkpoints line up one-to-one.
"""
from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from image2text_tpu.configs.models import (
    MLPConfig,
    MoEConfig,
    SelfAttentionConfig,
    SelfAttentionType,
    TransformerConfig,
)
from image2text_tpu.nn.core import (
    Ctx,
    Identity,
    Module,
    ModuleList,
    dropout,
    normal_init,
    sp_constrain,
    uniform_init,
)
from image2text_tpu.nn.modules import (
    Conv2d,
    Embedding,
    LayerNorm,
    LayerNormND,
    Linear,
    MultiheadAttention,
    gelu_tanh,
)
from image2text_tpu.ops.attention import causal_bias, sdpa
from image2text_tpu.ops.functions import normalize_gradients
from image2text_tpu.ops.static_gather import (canonicalize, layout_rows,
                                              static_combine, static_take)


# ---------------------------------------------------------------------------
# MLPs
# ---------------------------------------------------------------------------

class MLP(Module):
    """Generic MLP with optional hidden gates and residual connector.

    Children are named 'model.0', 'model.2', ... to mirror the reference's
    torch Sequential indices, where odd slots are parameterless GELUs
    (reference layers.py:222-255).
    """

    def __init__(self, in_features: int, out_features: int,
                 gate_sizes: Optional[Tuple[int, ...]] = None,
                 bias: bool = True, add_residual_connection: bool = False):
        super().__init__()
        gate_sizes = tuple(gate_sizes) if gate_sizes is not None else ()
        self.layer_ids = []
        sizes = (in_features,) + gate_sizes + (out_features,)
        seq = Module()
        idx = 0
        self.linears = []
        for i in range(len(sizes) - 1):
            lin = Linear(sizes[i], sizes[i + 1], bias=bias)
            seq.add(str(idx), lin)
            self.layer_ids.append(str(idx))
            self.linears.append(lin)
            idx += 2  # skip the GELU slot
        self.add("model", seq)
        self.add_residual_connection = add_residual_connection
        if add_residual_connection and in_features != out_features:
            self.residual_connector = Linear(in_features, out_features)
            self.add("residual_connector", self.residual_connector)
        else:
            self.residual_connector = None

    def forward(self, p, x, ctx: Ctx = Ctx(), **kwargs):
        h = x
        for i, (lid, lin) in enumerate(zip(self.layer_ids, self.linears)):
            h = lin(p["model"][lid], h)
            if i < len(self.layer_ids) - 1:
                h = gelu_tanh(h)
        if self.add_residual_connection:
            res = x if self.residual_connector is None \
                else self.residual_connector(p["residual_connector"], x)
            return h + res
        return h


class ConvMLP(Module):
    """Stack of 'same'-padded convs with GELU gates (reference layers.py:258)."""

    def __init__(self, in_features: int, out_features: int,
                 kernel_size: Tuple[int, int],
                 gate_sizes: Optional[Tuple[int, ...]] = None):
        super().__init__()
        gate_sizes = tuple(gate_sizes) if gate_sizes is not None else ()
        sizes = (in_features,) + gate_sizes + (out_features,)
        seq = Module()
        self.layer_ids = []
        self.convs = []
        idx = 0
        for i in range(len(sizes) - 1):
            conv = Conv2d(sizes[i], sizes[i + 1], kernel_size)
            seq.add(str(idx), conv)
            self.layer_ids.append(str(idx))
            self.convs.append(conv)
            idx += 2
        self.add("model", seq)

    def forward(self, p, x, ctx: Ctx = Ctx(), **kwargs):
        h = x
        for i, (lid, conv) in enumerate(zip(self.layer_ids, self.convs)):
            h = conv(p["model"][lid], h)
            if i < len(self.layer_ids) - 1:
                h = gelu_tanh(h)
        return h


class _MLP(Module):
    """Transformer block FFN with GPT-2 naming (c_fc/c_proj) for checkpoint
    surgery (reference layers.py:473-486)."""

    def __init__(self, n_embd: int, bias: bool, dropout_rate: float, config: MLPConfig):
        super().__init__()
        hidden = int(config.ff_mult * n_embd)
        self.c_fc = self.add("c_fc", Linear(n_embd, hidden, bias=bias))
        self.c_proj = self.add("c_proj", Linear(hidden, n_embd, bias=bias))
        self.dropout_rate = dropout_rate

    def forward(self, p, x, ctx: Ctx = Ctx(), **kwargs):
        h = gelu_tanh(self.c_fc(p["c_fc"], x, ctx=ctx.fold(11)))
        h = self.c_proj(p["c_proj"], h, ctx=ctx.fold(12))
        h, ctx = dropout(h, self.dropout_rate, ctx)
        return h


# ---------------------------------------------------------------------------
# Mixture of Experts
# ---------------------------------------------------------------------------

class MoELinear(Module):
    """Top-k MoE over low-rank experts, dense-vectorized for TPU.

    Gate semantics match the reference (layers.py:301-346): gate scores are
    scaled by 1/sqrt(in_features), softmaxed, and the *unnormalized* top-k
    weights combine expert outputs (Switch-style gradient flow,
    arxiv 2101.03961).  Dispatch differs by design: every expert runs on
    every token as one stacked einsum (experts are low-rank so the extra
    FLOPs are negligible), and a scattered one-hot weight matrix selects the
    top-k combination — no dynamic shapes, no host loop.

    Experts are stored natively STACKED (leading expert axis) — the einsum
    operands are single parameters, ready for expert-axis sharding; the
    checkpoint layer splits/joins them to the reference's per-expert
    ``experts.{i}.l1/l2.weight/bias`` keys (split specs below).
    """

    def __init__(self, in_features: int, out_features: int, proj_features: int,
                 num_experts: int, bias: bool = True, top_k: int = 1,
                 gate_sizes: Optional[Tuple[int, ...]] = None):
        super().__init__()
        self._in_features = in_features
        self._out_features = out_features
        self.num_experts = num_experts
        self.top_k = top_k
        self.expert_gates = self.add(
            "expert_gates", MLP(in_features, num_experts, gate_sizes=gate_sizes, bias=bias))
        e = num_experts
        self.param("l1_weight", (e, proj_features, in_features),
                   uniform_init(1.0 / math.sqrt(in_features)))
        self.param("l1_bias", (e, proj_features),
                   uniform_init(1.0 / math.sqrt(in_features)))
        self.param("l2_weight", (e, out_features, proj_features),
                   uniform_init(1.0 / math.sqrt(proj_features)))
        self.param("l2_bias", (e, out_features),
                   uniform_init(1.0 / math.sqrt(proj_features)))
        self._split_specs = {
            "l1_weight": ("experts.{i}.l1.weight", e),
            "l1_bias": ("experts.{i}.l1.bias", e),
            "l2_weight": ("experts.{i}.l2.weight", e),
            "l2_bias": ("experts.{i}.l2.bias", e),
        }

    def forward(self, p, x, ctx: Ctx = Ctx(), **kwargs):
        e = self.num_experts
        gate_logits = self.expert_gates(p["expert_gates"], x, ctx=ctx)
        gate_values = jax.nn.softmax(
            gate_logits.astype(jnp.float32) / math.sqrt(self._in_features), axis=-1)
        top_w, top_i = jax.lax.top_k(gate_values, self.top_k)  # (..., k)
        # dense combine weights: (..., e) with top-k gate values, 0 elsewhere
        combine = jnp.sum(jax.nn.one_hot(top_i, e, dtype=top_w.dtype)
                          * top_w[..., None], axis=-2)

        dt = x.dtype
        h = jnp.einsum("...i,epi->...ep", x, p["l1_weight"].astype(dt),
                       preferred_element_type=jnp.float32).astype(dt) \
            + p["l1_bias"].astype(dt)
        h = gelu_tanh(h)
        # fold the combine weights into the (tiny) low-rank activations and
        # contract expert+proj axes at once:   Σ_e c_e·(h_e·W2_e + b_e)
        # = (c⊙h)·W2 + c·b — algebraically identical, but the per-expert
        # output tensor (..., e, out) is never materialised (it was
        # num_experts × hidden floats per token of pure HBM traffic; the
        # MoE FFN measured 2.07 ms/block at batch 256 against a ~0.7 ms
        # floor, PROFILE_ENC_BLOCK.json)
        hw = h * combine[..., None].astype(dt)
        # outputs drop to the compute dtype straight out of each einsum's
        # f32 accumulator: keeping y in f32 through the bias add doubled
        # the FFN's HBM traffic for precision the reference's autocast
        # path never had (module 2.55 ms vs this form 1.74 ms per block at
        # batch 256, PROFILE_ENC_BLOCK.json; identical in f32 runs)
        y = jnp.einsum("...ep,eop->...o", hw, p["l2_weight"].astype(dt),
                       preferred_element_type=jnp.float32).astype(dt)
        yb = jnp.einsum("...e,eo->...o", combine.astype(dt),
                        p["l2_bias"].astype(dt),
                        preferred_element_type=jnp.float32).astype(dt)
        return y + yb


class _MoEMLP(Module):
    """Transformer block FFN built from two MoELinears (reference layers.py:489)."""

    def __init__(self, n_embd: int, bias: bool, dropout_rate: float, config: MoEConfig):
        super().__init__()
        hidden = int(config.ff_mult_factor * n_embd)
        kw = dict(proj_features=config.proj_features, num_experts=config.num_experts,
                  bias=bias, top_k=config.top_k, gate_sizes=config.gate_sizes)
        self.c_fc = self.add("c_fc", MoELinear(n_embd, hidden, **kw))
        self.c_proj = self.add("c_proj", MoELinear(hidden, n_embd, **kw))
        self.dropout_rate = dropout_rate

    def forward(self, p, x, ctx: Ctx = Ctx(), **kwargs):
        if not ctx.train:
            # serving path: the whole FFN (gates, top-k combine, both
            # low-rank expert contractions, both GELUs) in ONE Pallas
            # kernel — the hidden-wide activation never touches HBM
            # (ops/fused_moe.py; XLA composition measured ~1.7 ms/block
            # against a ~0.2 ms floor at batch 256, PROFILE_ENC_BLOCK).
            # Dropout is eval-dead here; training/autodiff stays on the
            # XLA path below (the kernel defines no VJP).
            from image2text_tpu.ops.fused_moe import fused_moe_mlp_compatible

            out = fused_moe_mlp_compatible(self, p, x)
            if out is not None:
                return out
        h = gelu_tanh(self.c_fc(p["c_fc"], x, ctx=ctx.fold(1)))
        h = self.c_proj(p["c_proj"], h, ctx=ctx.fold(2))
        h, ctx = dropout(h, self.dropout_rate, ctx)
        return h


# ---------------------------------------------------------------------------
# Attention
# ---------------------------------------------------------------------------

class SelfAttention(Module):
    def __init__(self, config: SelfAttentionConfig):
        super().__init__()
        assert config.n_embd % config.n_head == 0
        self.config = config

    @classmethod
    def from_config(cls, config: SelfAttentionConfig) -> "SelfAttention":
        if config.attn_type == SelfAttentionType.MULTI_HEAD:
            return MultiHeadAttention(config)
        if config.attn_type == SelfAttentionType.MULTI_QUERY:
            return MultiQueryAttention(config)
        raise ValueError("unknown self attn implementation!")


def _token_dropout(shape, rate: float, ctx: Ctx):
    """The reference's 'attention dropout': dropout masks over per-token ones
    multiplied into q/k/v (layers.py:454-461). Returns 3 masks and the ctx;
    eval masks are ``None`` — the identity multiply is skipped entirely
    rather than trusting XLA to fold a materialised ones tensor out of
    three full q/k/v passes per attention call."""
    if not ctx.train or rate <= 0.0:
        return None, None, None, ctx
    ones = jnp.ones(shape, jnp.float32)
    k_do, ctx = dropout(ones, rate, ctx)
    q_do, ctx = dropout(ones, rate, ctx)
    v_do, ctx = dropout(ones, rate, ctx)
    return k_do, q_do, v_do, ctx


def _mask_mul(m, z, dt):
    """z · m in the storage dtype, identity when m is None (eval)."""
    return z if m is None else m.astype(dt) * z


class MultiHeadAttention(SelfAttention):
    """Fused-qkv MHA (reference layers.py:433-470)."""

    def __init__(self, config: SelfAttentionConfig):
        super().__init__(config)
        self.c_attn = self.add("c_attn", Linear(config.n_embd, 3 * config.n_embd,
                                                bias=config.bias))
        self.c_proj = self.add("c_proj", Linear(config.n_embd, config.n_embd,
                                                bias=config.bias))
        self.n_head = config.n_head
        self.n_embd = config.n_embd
        self.attn_dropout = config.attn_dropout
        self.resid_dropout = config.dropout

    def kv_shape(self, batch: int, max_len: int):
        return (batch, self.n_head, max_len, self.n_embd // self.n_head)

    def forward(self, p, x, mask=None, ctx: Ctx = Ctx(), use_flash: bool = True,
                kv_cache=None, causal: bool = False, cache_write=None, **kwargs):
        b, t, c = x.shape
        hd = c // self.n_head
        # ctx threads into the projections so LoRA-wrapped layers can apply
        # their adapter dropout in train mode
        qkv = self.c_attn(p["c_attn"], x, ctx=ctx.fold(11))
        q, k, v = jnp.split(qkv, 3, axis=-1)

        k_do, q_do, v_do, ctx = _token_dropout((b, 1, t, 1), self.attn_dropout, ctx)
        def heads(z):
            return z.reshape(b, t, self.n_head, hd).transpose(0, 2, 1, 3)
        q = _mask_mul(q_do, heads(q), x.dtype)
        k = _mask_mul(k_do, heads(k), x.dtype)
        v = _mask_mul(v_do, heads(v), x.dtype)

        if kv_cache is not None:
            k, v, mask = kv_cache.update(k, v, mask, write=cache_write)

        y = sdpa(q, k, v, mask=mask,
                 dropout_rate=self.resid_dropout if ctx.train else 0.0,
                 ctx=ctx.fold(3), use_flash=use_flash, causal=causal)
        y = y.transpose(0, 2, 1, 3).reshape(b, q.shape[2], c)
        y = self.c_proj(p["c_proj"], y, ctx=ctx.fold(12))
        y, ctx = dropout(y, self.resid_dropout, ctx.fold(4))
        return y


class MultiQueryAttention(SelfAttention):
    """Multi-query attention: one shared K/V head (reference layers.py:391-430)."""

    def __init__(self, config: SelfAttentionConfig):
        super().__init__(config)
        hd = config.n_embd // config.n_head
        self.q_proj = self.add("q_proj", Linear(config.n_embd, config.n_embd,
                                                bias=config.bias))
        self.kv_proj = self.add("kv_proj", Linear(config.n_embd, 2 * hd,
                                                  bias=config.bias))
        self.out_proj = self.add("out_proj", Linear(config.n_embd, config.n_embd,
                                                    bias=config.bias))
        self.n_head = config.n_head
        self.n_embd = config.n_embd
        self.attn_dropout = config.attn_dropout
        self.resid_dropout = config.dropout

    def kv_shape(self, batch: int, max_len: int):
        return (batch, 1, max_len, self.n_embd // self.n_head)

    def forward(self, p, x, mask=None, ctx: Ctx = Ctx(), use_flash: bool = True,
                kv_cache=None, causal: bool = False, cache_write=None, **kwargs):
        b, t, c = x.shape
        hd = c // self.n_head
        q = self.q_proj(p["q_proj"], x, ctx=ctx.fold(11))
        kv = self.kv_proj(p["kv_proj"], x, ctx=ctx.fold(13))
        k, v = jnp.split(kv, 2, axis=-1)

        k_do, q_do, v_do, ctx = _token_dropout((b, 1, t, 1), self.attn_dropout, ctx)
        q = _mask_mul(q_do, q.reshape(b, t, self.n_head, hd).transpose(0, 2, 1, 3),
                      x.dtype)
        k = _mask_mul(k_do, k.reshape(b, t, 1, hd).transpose(0, 2, 1, 3), x.dtype)
        v = _mask_mul(v_do, v.reshape(b, t, 1, hd).transpose(0, 2, 1, 3), x.dtype)

        if kv_cache is not None:
            k, v, mask = kv_cache.update(k, v, mask, write=cache_write)

        y = sdpa(q, k, v, mask=mask,
                 dropout_rate=self.resid_dropout if ctx.train else 0.0,
                 ctx=ctx.fold(3), use_flash=use_flash, causal=causal)
        y = y.transpose(0, 2, 1, 3).reshape(b, q.shape[2], c)
        y = self.out_proj(p["out_proj"], y, ctx=ctx.fold(12))
        y, ctx = dropout(y, self.resid_dropout, ctx.fold(4))
        return y


# ---------------------------------------------------------------------------
# Transformer block
# ---------------------------------------------------------------------------

def sparse_attention_indices(max_block_size: int, sparsity_factor: float,
                             n_cls: int, seed: Optional[int]):
    """Per-depth random token subset, exactly the reference's construction
    (layers.py:549-558): PCG64(seed) permutation of the non-CLS positions,
    CLS positions always kept, selections *sorted* to preserve causality."""
    n_non_zeros = int(sparsity_factor * max_block_size)
    gen = np.random.Generator(np.random.PCG64(seed=seed)) if seed is not None \
        else np.random.default_rng()
    full_mask = np.concatenate([
        np.arange(0, n_cls, dtype=np.int64),
        gen.permutation(max_block_size - n_cls).astype(np.int64) + n_cls,
    ])
    idx = np.sort(full_mask[:n_non_zeros])
    not_idx = np.sort(full_mask[n_non_zeros:])
    return idx, not_idx


class TransformerBlock(Module):
    """Pre-LN block: self-attn → optional cross-attn → FFN, with optional
    static random-sparse token selection and per-block gradient
    normalization (reference layers.py:521-614)."""

    def __init__(self, config: TransformerConfig, seed: Optional[int] = None,
                 n_cls: int = 0):
        super().__init__()
        acfg = config.attn_config
        self.is_causal = config.is_causal
        self.ln_1 = self.add("ln_1", LayerNorm(acfg.n_embd, bias=acfg.bias))
        self.attn = self.add("attn", SelfAttention.from_config(acfg))
        self.ln_2 = self.add("ln_2", LayerNorm(acfg.n_embd, bias=acfg.bias))
        if isinstance(config.rotator_config, MLPConfig):
            self.mlp = self.add("mlp", _MLP(acfg.n_embd, acfg.bias, acfg.dropout,
                                            config.rotator_config))
        elif isinstance(config.rotator_config, MoEConfig):
            self.mlp = self.add("mlp", _MoEMLP(acfg.n_embd, acfg.bias, acfg.dropout,
                                               config.rotator_config))
        else:
            raise ValueError("Unknown rotator config")
        self.is_cross_attn = config.is_cross_attn
        if config.is_cross_attn:
            self.cross_attn = self.add("cross_attn", MultiheadAttention(
                acfg.n_embd, acfg.n_head, dropout=acfg.dropout))
            self.ln_3 = self.add("ln_3", LayerNorm(acfg.n_embd, bias=acfg.bias))
        else:
            self.cross_attn = None
            self.ln_3 = None
        self.is_sparse = config.is_sparse_attn
        self.n_cls = n_cls
        if self.is_sparse:
            assert config.max_block_size is not None, \
                "need to specify max_block_size for sparse attention"
            idx, not_idx = sparse_attention_indices(
                config.max_block_size, config.sparsity_factor, n_cls, seed)
            # static numpy copies drive the gathers; the buffers keep
            # checkpoint-key parity with the reference's registered buffers
            self.idx_np, self.not_idx_np = idx, not_idx
            sel = np.zeros(config.max_block_size, bool)
            sel[idx] = True
            self._sel_mask_np = sel
            # running count of selected positions ≤ i: the reference's
            # bypass rule is GLOBAL per forward call (all positions take
            # the null path while <2 are selected, layers.py:570-577), so
            # cached decode gates on this cumulative count
            self._cum_sel_np = np.cumsum(sel)
            self.buffer("input_mask_idx", idx)
            self.buffer("input_mask_not_idx", not_idx)
            self.null_connector = self.add(
                "null_connector", Linear(acfg.n_embd, acfg.n_embd, bias=acfg.bias))
        else:
            self.null_connector = None

    def cache_shape(self, batch: int, max_len: int):
        """Per-layer KV-cache shape: dense layers need ``max_len`` slots;
        sparse layers only hold their selected TEXT positions within the
        decode window [n_cls, n_cls + max_len)."""
        if not self.is_sparse:
            return self.attn.kv_shape(batch, max_len)
        n_sel = int(((self.idx_np >= self.n_cls)
                     & (self.idx_np < self.n_cls + max_len)).sum())
        return self.attn.kv_shape(batch, max(n_sel, 1))

    def next_layout(self, layout, t: int):
        """Static row layout this block's lazy path would emit for a stream
        of ``t`` rows entering under ``layout`` (None = canonical).  Pure
        trace-time bookkeeping for the block loops — must mirror
        ``forward(want_lazy=True)`` exactly."""
        if not self.is_sparse:
            return None
        idx = self.idx_np[self.idx_np < t]
        if idx.shape[0] <= 1:
            return layout  # whole-stream null path keeps row order
        not_idx = self.not_idx_np[self.not_idx_np < t]
        return np.concatenate([idx, not_idx])

    def forward(self, p, x_orig, cross_attn_inputs=None, attn_mask=None,
                ctx: Ctx = Ctx(), use_flash: bool = True, kv_cache=None,
                cross_kv=None, sparse_rule_len=None, layout=None,
                want_lazy: bool = False, **kwargs):
        """``layout``/``want_lazy`` (lazy sparse reassembly): when the
        block loops thread a static row ``layout`` (stream row j holds
        canonical position layout[j]) and ask for a lazy return, a sparse
        block composes its static gathers with the incoming layout and
        returns ``(stream, new_layout)`` WITHOUT the end-of-block
        combine permutation — consecutive sparse blocks then cost one
        gather each instead of gather+scatter, and the stack reassembles
        once at the end (``ops.static_gather.canonicalize``).  Bitwise
        equal to the eager path (one-hot gathers are exact; pinned by
        tests/test_static_gather.py)."""
        if self.is_sparse and kv_cache is not None:
            assert layout is None and not want_lazy, \
                "lazy sparse layout is a non-cached-forward optimization"
            return self._sparse_cached_forward(
                p, x_orig, cross_attn_inputs, attn_mask, ctx, use_flash,
                kv_cache, cross_kv)
        if layout is not None and not self.is_sparse:
            x_orig = canonicalize(x_orig, layout)  # dense block: canonical
            layout = None
        x_orig = sp_constrain(self, x_orig, ctx, kv_cache)
        if self.is_sparse:
            assert sparse_rule_len is None or layout is None, \
                "the generation fallback runs blocks in canonical order"
            t = x_orig.shape[1]
            idx = self.idx_np[self.idx_np < t]
            if idx.shape[0] <= 1:
                out = x_orig + self.null_connector(p["null_connector"], x_orig)
                if want_lazy:
                    return out, layout
                return out if layout is None else canonicalize(out, layout)
            not_idx = self.not_idx_np[self.not_idx_np < t]
            if (want_lazy and use_flash and not ctx.train
                    and kv_cache is None and attn_mask is None
                    and cross_attn_inputs is None and cross_kv is None
                    and not self.is_causal and sparse_rule_len is None):
                # serving path v2: select-gather + residual chain + null
                # bypass + [sel; byp] concat in ONE Pallas kernel
                # (ops/fused_block.py::_sparse_block_kernel) — the
                # XLA-side sparse machinery (static_take / null linear /
                # concat) cost ~2 ms/block at batch 256 on top of the
                # fused chain (PROFILE_ENC_BLOCK.json scatter rows)
                from image2text_tpu.ops.fused_block import (
                    fused_sparse_block_compatible)

                stream = fused_sparse_block_compatible(self, p, x_orig,
                                                       layout)
                if stream is not None:
                    return (sp_constrain(self, stream, ctx, kv_cache),
                            np.concatenate([idx, not_idx]))
            x = static_take(x_orig, layout_rows(layout, idx))
            if attn_mask is not None:
                attn_mask = jnp.take(jnp.take(attn_mask, idx, axis=-2), idx, axis=-1)
        else:
            x = x_orig
            idx = not_idx = None

        # with a cache the causal-over-global-positions bias comes from
        # CacheRef.update, which sees the true key length; otherwise the
        # causal intent flows to sdpa as a flag (in-kernel mask for flash)
        causal = self.is_causal and kv_cache is None
        fused = None
        if (use_flash and not ctx.train and kv_cache is None
                and attn_mask is None and cross_attn_inputs is None
                and cross_kv is None and not causal):
            # (use_flash doubles as the kernel escape hatch: the
            # disable_flash parity mode must run the pure XLA block)
            # serving path: the whole block residual chain in ONE Pallas
            # kernel (ops/fused_block.py) — intermediates (ln outs,
            # projections, scores, FFN hidden) never touch HBM.
            # normalize_gradients is identity at eval; dispatch declines
            # (None) for configs outside the kernel's scope.
            from image2text_tpu.ops.fused_block import fused_block_compatible

            fused = fused_block_compatible(self, p, x)
        if fused is not None:
            x = fused
        else:
            x = x + self.attn(p["attn"], self.ln_1(p["ln_1"], x), mask=attn_mask,
                              ctx=ctx.fold(1), use_flash=use_flash,
                              kv_cache=kv_cache, causal=causal)
            if cross_attn_inputs is not None or cross_kv is not None:
                if not self.is_cross_attn:
                    raise ValueError("Model not configured for cross attn inputs!!!")
                x = x + self.cross_attn(p["cross_attn"],
                                        self.ln_3(p["ln_3"], x),
                                        cross_attn_inputs, cross_attn_inputs,
                                        ctx=ctx.fold(2), precomputed_kv=cross_kv)
            x = x + self.mlp(p["mlp"], self.ln_2(p["ln_2"], x), ctx=ctx.fold(3))
            x = normalize_gradients(x)
        if not self.is_sparse:
            out = sp_constrain(self, x, ctx, kv_cache)
            return (out, None) if want_lazy else out
        bypass = static_take(x_orig, layout_rows(layout, not_idx))
        bypass_out = bypass + self.null_connector(p["null_connector"], bypass)
        if want_lazy:
            # same operand dtypes as the eager static_combine concat
            stream = jnp.concatenate([x.astype(x_orig.dtype), bypass_out],
                                     axis=1)
            return (sp_constrain(self, stream, ctx, kv_cache),
                    np.concatenate([idx, not_idx]))
        x_final = static_combine(
            x.astype(x_orig.dtype), bypass_out, idx, not_idx)
        if sparse_rule_len is not None:
            # fixed-size re-forward buffers (generation fallback): the
            # reference evaluates the global <2-selected bypass rule at the
            # CURRENT sequence length (it re-forwards the growing sequence,
            # layers.py:570-577), not at the padded buffer length — gate on
            # the traced valid length so the fallback stays
            # reference-exact through the count-crossing window
            count = jnp.take(jnp.asarray(self._cum_sel_np),
                             jnp.clip(jnp.asarray(sparse_rule_len) - 1, 0,
                                      len(self._cum_sel_np) - 1))
            null_all = x_orig + self.null_connector(p["null_connector"],
                                                    x_orig)
            return jnp.where(count >= 2, x_final, null_all)
        return sp_constrain(self, x_final, ctx, kv_cache)

    # -- sparse attention with a KV cache ------------------------------------
    def _sparse_cached_forward(self, p, x_orig, cross_attn_inputs, attn_mask,
                               ctx: Ctx, use_flash: bool, kv_cache, cross_kv):
        """Cached decode for random-sparse layers.

        Selection indices are static per depth, so cache slots are simply
        ranks among selected text positions and the CacheRef's
        causal-over-slots bias is the correct mask (slot order == position
        order).  Prefill (static chunk positions) gathers the selected
        subset; single-token decode gates the cache write and selects
        between the attention path and the null bypass.
        """
        assert attn_mask is None, \
            "sparse cached decode is generation-only (no padding masks)"
        positions = kv_cache.positions
        assert positions is not None, "decoder must set CacheRef.positions"
        t = x_orig.shape[1]

        def body(x, write=None):
            x = x + self.attn(p["attn"], self.ln_1(p["ln_1"], x), mask=None,
                              ctx=ctx.fold(1), use_flash=use_flash,
                              kv_cache=kv_cache, cache_write=write)
            if cross_attn_inputs is not None or cross_kv is not None:
                x = x + self.cross_attn(p["cross_attn"],
                                        self.ln_3(p["ln_3"], x),
                                        cross_attn_inputs, cross_attn_inputs,
                                        ctx=ctx.fold(2), precomputed_kv=cross_kv)
            x = x + self.mlp(p["mlp"], self.ln_2(p["ln_2"], x), ctx=ctx.fold(3))
            return normalize_gradients(x)

        def null_path(z):
            return z + self.null_connector(p["null_connector"], z)

        if isinstance(positions, np.ndarray):
            # prefill: static positions → static selected subset
            local = [i for i in range(t)
                     if positions[i] < len(self._sel_mask_np)
                     and self._sel_mask_np[positions[i]]]
            if not local:
                kv_cache.skip()
                return null_path(x_orig)
            local = np.asarray(local)
            not_local = np.asarray(sorted(set(range(t)) - set(local.tolist())))
            x = body(static_take(x_orig, local))   # writes selected KV
            # global bypass rule at this chunk's length: <2 selected so far
            # → every position takes the null path (KV stays written — it
            # depends only on the layer INPUT and later steps attend it)
            last = min(int(positions[-1]), len(self._cum_sel_np) - 1)
            if int(self._cum_sel_np[last]) < 2:
                return null_path(x_orig)
            bypass = static_take(x_orig, not_local) if len(not_local) else None
            return static_combine(
                x.astype(x_orig.dtype),
                null_path(bypass) if bypass is not None else x[:, :0],
                local, not_local)

        # single-token decode: traced position → gated write + select
        assert t == 1, "traced-position sparse decode is single-token"
        pos = jnp.asarray(positions)[0]
        in_range = pos < len(self._sel_mask_np)
        selected = in_range & jnp.take(jnp.asarray(self._sel_mask_np), pos,
                                       mode="clip")
        active = selected & (
            jnp.take(jnp.asarray(self._cum_sel_np), pos, mode="clip") >= 2)
        x = body(x_orig, write=selected)
        return jnp.where(active, x, null_path(x_orig))


# ---------------------------------------------------------------------------
# Positional MLP
# ---------------------------------------------------------------------------

class AdvancedPositionalBiasMLP(Module):
    """One residual MLP per position, evaluated as a single batched einsum
    (reference layers.py:617-638 loops in Python; here the loop is the 'p'
    axis of a dot_general).

    Per-position weights are stored natively STACKED along a leading
    position axis; the checkpoint layer splits/joins them to the
    reference's ``models.{i}.model.{lid}.weight`` keys."""

    def __init__(self, context_width: int, in_features: int, out_features: int,
                 gate_sizes: Optional[Tuple[int, ...]] = None,
                 add_residual_connection: bool = True):
        super().__init__()
        self.context_width = context_width
        self.in_features = in_features
        self.out_features = out_features
        self.add_residual = add_residual_connection
        self.needs_res_proj = add_residual_connection and in_features != out_features
        gate_sizes = tuple(gate_sizes) if gate_sizes is not None else ()
        sizes = (in_features,) + gate_sizes + (out_features,)
        self.layer_ids = [str(2 * i) for i in range(len(sizes) - 1)]
        self.layer_sizes = sizes
        P = context_width
        for j, lid in enumerate(self.layer_ids):
            fi, fo = sizes[j], sizes[j + 1]
            self.param(f"w{lid}", (P, fo, fi), uniform_init(1.0 / math.sqrt(fi)))
            self.param(f"b{lid}", (P, fo), uniform_init(1.0 / math.sqrt(fi)))
            self._split_specs[f"w{lid}"] = (
                f"models.{{i}}.model.{lid}.weight", P)
            self._split_specs[f"b{lid}"] = (
                f"models.{{i}}.model.{lid}.bias", P)
        if self.needs_res_proj:
            self.param("w_res", (P, out_features, in_features),
                       uniform_init(1.0 / math.sqrt(in_features)))
            self.param("b_res", (P, out_features),
                       uniform_init(1.0 / math.sqrt(in_features)))
            self._split_specs["w_res"] = (
                "models.{i}.residual_connector.weight", P)
            self._split_specs["b_res"] = (
                "models.{i}.residual_connector.bias", P)

    def _apply(self, p, x, pick):
        """pick(arr) selects the per-position slices for this call."""
        dt = x.dtype
        h = x
        n_layers = len(self.layer_ids)
        for j, lid in enumerate(self.layer_ids):
            w = pick(p[f"w{lid}"]).astype(dt)   # (t, out, in)
            b = pick(p[f"b{lid}"]).astype(dt)   # (t, out)
            h = jnp.einsum("...pi,poi->...po", h, w,
                           preferred_element_type=jnp.float32).astype(dt) + b
            if j < n_layers - 1:
                h = gelu_tanh(h)
        if self.add_residual:
            if self.needs_res_proj:
                rw = pick(p["w_res"]).astype(dt)
                rb = pick(p["b_res"]).astype(dt)
                res = jnp.einsum("...pi,poi->...po", x, rw,
                                 preferred_element_type=jnp.float32).astype(dt) + rb
            else:
                res = x
            h = h + res
        return h

    def forward(self, p, x, ctx: Ctx = Ctx(), **kwargs):
        # x: (..., t, in) with t <= context_width; only the first t
        # per-position MLPs apply (the reference zips models with positions,
        # layers.py:638)
        n_pos = x.shape[-2]
        assert n_pos <= self.context_width
        return self._apply(p, x, lambda arr: arr[:n_pos])

    def forward_at(self, p, x, positions, ctx: Ctx = Ctx()):
        """Apply the per-position MLPs for *dynamic* ``positions`` (t,) to
        x (..., t, in) — the KV-cached decode path, where the token's global
        position is a traced index rather than its array slot."""
        return self._apply(p, x,
                           lambda arr: jnp.take(arr, positions, axis=0))


# ---------------------------------------------------------------------------
# PEER product-key memory
# ---------------------------------------------------------------------------

class PeerLookupQueryUnit(Module):
    """Linear scorer + top-k (reference layers.py:21-34)."""

    def __init__(self, num_embed: int, emb_dim: int, topk: int):
        super().__init__()
        self.linear = self.add("linear", Linear(emb_dim, num_embed, bias=False))
        self.topk = topk

    def forward(self, p, x, **kwargs):
        scores = self.linear(p["linear"], x)
        return jax.lax.top_k(scores, self.topk)


class PeerLookup(Module):
    """Product-key memory lookup (reference layers.py:37-109).

    Cartesian sum of left/right top-k scores re-topk'd to k of k²; composite
    indices gather rows of the in/out embedding tables; GELU(input·key)
    gating × softmax scores weights the out-embeddings; linear residual.
    """

    def __init__(self, in_features: int, out_features: int, num_units: int,
                 topk: int, nhead: int = 1, query_dim: Optional[int] = None):
        super().__init__()
        self.query_dim = query_dim or (in_features // 2)
        self.residual = self.add("residual", Linear(in_features, out_features, bias=False))
        self.query_linear = self.add(
            "query_linear", Linear(in_features, self.query_dim * nhead, bias=False))
        self.key_linear = self.add(
            "key_linear", Linear(in_features, in_features * nhead, bias=False))
        self.nhead = nhead
        self.in_features = in_features
        self.num_query_units = int(math.sqrt(num_units))
        self.topk = topk
        if self.num_query_units * self.num_query_units != num_units:
            raise ValueError(
                f"num_units must be a perfect square but {num_units} was not")
        self.query_left = self.add("query_left", PeerLookupQueryUnit(
            self.num_query_units, self.query_dim, topk))
        self.query_right = self.add("query_right", PeerLookupQueryUnit(
            self.num_query_units, self.query_dim, topk))
        self.emb_in = self.add("emb_in", Embedding(num_units, in_features))
        self.emb_out = self.add("emb_out", Embedding(num_units, out_features))

    def forward(self, p, inp, ctx: Ctx = Ctx(), **kwargs):
        bs, seq_len, _ = inp.shape
        x = self.query_linear(p["query_linear"], inp).reshape(
            bs, seq_len, self.nhead, self.query_dim)
        inp_proj = self.key_linear(p["key_linear"], inp).reshape(
            bs, seq_len, self.nhead, self.in_features)
        residual = self.residual(p["residual"], inp)

        left_v, left_i = self.query_left(p["query_left"], x)
        right_v, right_i = self.query_right(p["query_right"], x)

        cross = (left_v[..., :, None] + right_v[..., None, :]).reshape(
            bs, seq_len, self.nhead, self.topk * self.topk)
        dot, indices = jax.lax.top_k(cross, self.topk)
        scores = jax.nn.softmax(dot.astype(jnp.float32), axis=-1).astype(inp.dtype)

        left_sel = indices // self.topk
        right_sel = indices % self.topk
        left_tr = jnp.take_along_axis(left_i, left_sel, axis=-1)
        right_tr = jnp.take_along_axis(right_i, right_sel, axis=-1)
        # NOTE: composite index construction mirrors the reference exactly
        # (layers.py:94-97), including its use of topk (not num_query_units)
        # as the mixing radix.
        final_indices = left_tr * self.topk + right_tr  # (b, s, h, k)

        inp_expert = self.emb_in(p["emb_in"], final_indices)   # (b,s,h,k,in)
        out_expert = self.emb_out(p["emb_out"], final_indices)  # (b,s,h,k,out)

        in_dot = jnp.einsum("bshkd,bshd->bshk", inp_expert.astype(inp.dtype), inp_proj,
                            preferred_element_type=jnp.float32).astype(inp.dtype)
        in_act = gelu_tanh(in_dot)
        final_weight = scores * in_act
        out = jnp.einsum("bshk,bshkd->bsd", final_weight,
                         out_expert.astype(inp.dtype),
                         preferred_element_type=jnp.float32).astype(inp.dtype)
        return out + residual


# ---------------------------------------------------------------------------
# LSH embeddings
# ---------------------------------------------------------------------------

class CosineVectorEmbedding(Module):
    """Frozen-random-projection LSH vector embedding (reference layers.py:112).

    Projections/grid/offsets are persistent buffers; the EmbeddingBag(mean)
    becomes a take + mean."""

    def __init__(self, inp_dim: int, emb_dim: int, n_proj: int = 16,
                 num_bins: int = 20, seed: int = 0):
        super().__init__()
        gen = np.random.Generator(np.random.PCG64(seed=seed))
        proj = gen.standard_normal((inp_dim, n_proj)).astype(np.float32)
        proj = proj / np.linalg.norm(proj, axis=0, keepdims=True)
        self.buffer("projection_mat", proj)
        resolution = 2.0 / num_bins
        grid = np.linspace(-1, 1, num_bins + 1)[:-1] + 0.5 * resolution
        self.buffer("grid", grid.astype(np.float32))
        pos_offset = ((num_bins + 1) * np.arange(n_proj, dtype=np.int64)).reshape(-1, 1, 1)
        self.buffer("pos_offset", pos_offset)
        self.emb = self.add("emb", Embedding((num_bins + 1) * n_proj, emb_dim))
        self.emb_dim = emb_dim
        self.n_proj = n_proj

    def forward(self, p, x, ctx: Ctx = Ctx(), **kwargs):
        bs, seq_len, _ = x.shape
        xn = x / (jnp.linalg.norm(x, axis=-1, keepdims=True) + 1e-12)
        z = xn @ p["projection_mat"].astype(x.dtype)  # (b, s, n_proj)
        bins = jnp.searchsorted(p["grid"], z.astype(jnp.float32), side="left")
        bins = bins + jnp.arange(self.n_proj)[None, None, :] * (p["grid"].shape[0] + 1)
        emb = self.emb(p["emb"], bins)  # (b, s, n_proj, emb_dim)
        return jnp.mean(emb, axis=-2)  # EmbeddingBag default mode='mean'


class CosineLinear(Module):
    """Cosine similarity linear layer (reference layers.py:147-153)."""

    def __init__(self, inp_dim: int, out_dim: int):
        super().__init__()
        self.param("weight", (out_dim, inp_dim),
                   normal_init(std=1.0 / math.sqrt(inp_dim)))

    def forward(self, p, x, **kwargs):
        xn = x / (jnp.linalg.norm(x, axis=-1, keepdims=True) + 1e-12)
        w = p["weight"].astype(x.dtype)
        wn = w / (jnp.linalg.norm(w, axis=-1, keepdims=True) + 1e-12)
        return xn @ wn.T


class LearnableCosineVectorEmbedding(Module):
    """Learnable LSH indexer with Gaussian soft-binning (reference layers.py:156)."""

    def __init__(self, inp_dim: int, emb_dim: int, n_proj: int = 16,
                 num_bins: int = 20, sigma_inflation_factor: float = 1.0,
                 top_k: Optional[int] = None):
        super().__init__()
        self.emb_dim = emb_dim
        self.n_proj = n_proj
        self.num_bins = num_bins
        self.top_k = None if top_k is None else min(top_k, num_bins)
        self.sigma2 = (sigma_inflation_factor * 2.0 / num_bins) ** 2
        self.proj = self.add("proj", CosineLinear(inp_dim, n_proj))
        self.param("mean", (1, 1, n_proj, num_bins), uniform_init(1.0))
        self.emb = self.add("emb", Linear(n_proj * num_bins, emb_dim, bias=False))

    def forward(self, p, x, ctx: Ctx = Ctx(), **kwargs):
        bs, seq_len, _ = x.shape
        z = self.proj(p["proj"], x)
        diff = z[..., None] - p["mean"].astype(z.dtype)
        act = jnp.exp(-0.5 * diff * diff / self.sigma2)
        if self.top_k is not None:
            kth = jax.lax.top_k(act, self.top_k)[0][..., -1:]
            act = jnp.where(act < kth, jnp.zeros_like(act), act)
        act = act / (jnp.linalg.norm(act, axis=-1, keepdims=True) + 1e-12)
        return self.emb(p["emb"], act.reshape(bs, seq_len, self.n_proj * self.num_bins))


class CompositeCosineVectorEmbedding(Module):
    """Sum of LSH embeddings over several bin resolutions (reference layers.py:194)."""

    def __init__(self, inp_dim: int, emb_dim: int, num_bins: Tuple[int, ...],
                 n_proj: int, learnable: bool, seed: int = 0):
        super().__init__()
        mods = []
        for j, k in enumerate(num_bins):
            if learnable:
                mods.append(LearnableCosineVectorEmbedding(
                    inp_dim=inp_dim, emb_dim=emb_dim, n_proj=n_proj, num_bins=k))
            else:
                mods.append(CosineVectorEmbedding(
                    inp_dim=inp_dim, emb_dim=emb_dim, n_proj=n_proj, num_bins=k,
                    seed=seed * 1000 + j))
        self.emb = self.add("emb", ModuleList(mods))

    def forward(self, p, x, ctx: Ctx = Ctx(), **kwargs):
        x = x[:, None, :]  # (b, 1, d) — modules expect a sequence axis
        result = None
        for k, mod in enumerate(self.emb):
            y = mod(p["emb"][str(k)], x, ctx=ctx)
            result = y if result is None else result + y
        return result[:, 0, :]
