"""Primitive neural-net modules (torch-compatible param names and layouts).

These are the leaves of the model zoo: Linear/Embedding/LayerNorm/Conv2d plus
a torch-layout MultiheadAttention used for cross-attention.  Matmul-bearing
forwards cast weights to the activation dtype, so a bf16 compute policy is a
single cast on the inputs; normalisation statistics always run in fp32.
"""
from __future__ import annotations

import math
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from image2text_tpu.nn.core import (
    Ctx,
    Module,
    dropout,
    normal_init,
    torch_linear_weight_init,
    xavier_uniform_init,
    zeros_init,
    ones_init,
)


def gelu_tanh(x: jax.Array) -> jax.Array:
    """GELU with tanh approximation (reference uses GELU(approximate='tanh'))."""
    return jax.nn.gelu(x, approximate=True)


class Linear(Module):
    """y = x @ W.T + b with torch layout W:(out, in).

    Serving-mode W8A8: when the param dict carries ``qweight``/``qscale``
    instead of ``weight`` (see models/quantization.py
    ``int8_serving_params``), both operands run as int8 on the MXU's
    s8xs8->s32 mode — half the weight HBM traffic of bf16 and double the
    MXU rate.  Scales are per-ROW of each operand's contraction (per
    output feature for W, per token for x), so they factor out of the
    k-sum exactly; only the int8 rounding approximates."""

    def __init__(self, in_features: int, out_features: int, bias: bool = True):
        super().__init__()
        self.in_features = in_features
        self.out_features = out_features
        self.use_bias = bias
        self.param("weight", (out_features, in_features),
                   torch_linear_weight_init(in_features))
        if bias:
            self.param("bias", (out_features,), torch_linear_weight_init(in_features))

    def forward(self, p, x, **kwargs):
        if "qweight" in p:
            y = int8_dot_rows(x, p["qweight"], p["qscale"]).astype(x.dtype)
        else:
            w = p["weight"].astype(x.dtype)
            y = jax.lax.dot_general(
                x, w,
                dimension_numbers=(((x.ndim - 1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(x.dtype)
        if self.use_bias:
            y = y + p["bias"].astype(x.dtype)
        return y


class Embedding(Module):
    """Token embedding, torch layout (num_embeddings, dim), init N(0, 1)."""

    def __init__(self, num_embeddings: int, dim: int, init_std: float = 1.0):
        super().__init__()
        self.num_embeddings = num_embeddings
        self.dim = dim
        self.param("weight", (num_embeddings, dim), normal_init(std=init_std))

    def forward(self, p, idx, **kwargs):
        if "qweight" in p:
            return embedding_rows(p, idx)
        return jnp.take(p["weight"], idx, axis=0)


class LayerNorm(Module):
    """LayerNorm over the last dim with optional bias (reference layers.py:349)."""

    def __init__(self, ndim: int, bias: bool, eps: float = 1e-5):
        super().__init__()
        self.eps = eps
        self.use_bias = bias
        self.param("weight", (ndim,), ones_init())
        if bias:
            self.param("bias", (ndim,), zeros_init())

    def forward(self, p, x, **kwargs):
        orig_dtype = x.dtype
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
        y = (x32 - mean) * jax.lax.rsqrt(var + self.eps)
        y = y * p["weight"].astype(jnp.float32)
        if self.use_bias:
            y = y + p["bias"].astype(jnp.float32)
        return y.astype(orig_dtype)


class LayerNormND(Module):
    """LayerNorm over the trailing ``len(shape)`` dims (reference layers.py:361)."""

    def __init__(self, shape: Tuple[int, ...], bias: bool, eps: float = 1e-5):
        super().__init__()
        self.shape = tuple(shape)
        self.eps = eps
        self.use_bias = bias
        self.param("weight", self.shape, ones_init())
        if bias:
            self.param("bias", self.shape, zeros_init())

    def forward(self, p, x, **kwargs):
        orig_dtype = x.dtype
        x32 = x.astype(jnp.float32)
        axes = tuple(range(x.ndim - len(self.shape), x.ndim))
        mean = jnp.mean(x32, axis=axes, keepdims=True)
        var = jnp.mean(jnp.square(x32 - mean), axis=axes, keepdims=True)
        y = (x32 - mean) * jax.lax.rsqrt(var + self.eps)
        y = y * p["weight"].astype(jnp.float32)
        if self.use_bias:
            y = y + p["bias"].astype(jnp.float32)
        return y.astype(orig_dtype)


class Conv2d(Module):
    """NCHW conv with torch layout W:(out, in, kh, kw) and 'same' padding."""

    def __init__(self, in_channels: int, out_channels: int,
                 kernel_size: Tuple[int, int], bias: bool = True,
                 padding: str = "SAME",
                 stride: Tuple[int, int] = (1, 1)):
        super().__init__()
        self.padding = padding
        self.use_bias = bias
        self.stride = stride
        kh, kw = kernel_size
        fan_in = in_channels * kh * kw
        self.param("weight", (out_channels, in_channels, kh, kw),
                   torch_linear_weight_init(fan_in))
        if bias:
            self.param("bias", (out_channels,), torch_linear_weight_init(fan_in))

    def forward(self, p, x, **kwargs):
        w = p["weight"].astype(x.dtype)
        # no preferred_element_type: the conv transpose (VJP) rule rejects
        # mixed dtypes it induces; XLA's TPU conv accumulates fp32 in the
        # MXU regardless of a bf16 output dtype
        y = jax.lax.conv_general_dilated(
            x, w,
            window_strides=self.stride,
            padding=self.padding,
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        )
        if self.use_bias:
            y = y + p["bias"].astype(x.dtype)[None, :, None, None]
        return y


class QuantizedKV(NamedTuple):
    """Per-position symmetric-int8 K/V with k_q/v_q int8 of shape
    (..., h, s, d) and scales fp32 (..., h, s).

    Serving-mode cross-attention memory: the decode loop re-reads every
    layer's cross K/V each step (the dominant HBM term at large batch —
    ~4 GB/step for the flagship at batch 256), so int8 halves the decode
    roofline and lets batch-1024 cross-KV fit HBM.  Opt-in via
    ``generate(..., cross_kv_quant='int8')``; the exact bf16 path stays
    the default.  (NamedTuple: jax preserves the type through pytree
    flattening, so the isinstance dispatch survives jit boundaries.)"""

    k_q: jax.Array
    k_scale: jax.Array
    v_q: jax.Array
    v_scale: jax.Array


def quantize_rows_int8(t: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Symmetric per-row int8: (..., s, d) -> (int8 values, fp32 (..., s)
    scales) with t ≈ values * scales[..., None]."""
    scale = jnp.max(jnp.abs(t.astype(jnp.float32)), axis=-1) / 127.0
    scale = jnp.maximum(scale, 1e-12)
    q = jnp.clip(jnp.round(t.astype(jnp.float32) / scale[..., None]),
                 -127, 127).astype(jnp.int8)
    return q, scale


def embedding_rows(p, idx) -> jax.Array:
    """Gather embedding rows from an int8 serving form: dequantise only the
    gathered rows (one token's row per decode step) and return them in the
    ORIGINAL storage dtype recorded by the ``qdtype`` marker — returning
    f32 here would silently upcast the whole bf16 decode graph."""
    rows = jnp.take(p["qweight"], idx, axis=0).astype(jnp.float32)
    rows = rows * jnp.take(p["qscale"], idx, axis=0)[..., None]
    return rows.astype(p["qdtype"].dtype) if "qdtype" in p else rows


def int8_dot_rows(x: jax.Array, qw: jax.Array, qs: jax.Array) -> jax.Array:
    """W8A8 matmul: x (..., in) fp against a pre-quantized torch-layout
    weight qw (out, in) int8 with per-output-row fp32 scales qs (out,).

    Activations quantize per row on the fly; the dot runs s8xs8->s32 on
    the MXU and both row scales factor back out exactly — the only
    approximation is the two roundings.  Returns fp32 (..., out)."""
    xq, xs = quantize_rows_int8(x)
    y = jax.lax.dot_general(
        xq, qw,
        dimension_numbers=(((x.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32)
    return y.astype(jnp.float32) * xs[..., None] * qs


class MultiheadAttention(Module):
    """torch.nn.MultiheadAttention-compatible attention (batch_first).

    Used for the decoder's cross-attention (reference layers.py:537-542):
    packed in_proj for q/k/v plus out_proj, dropout applied to the attention
    probabilities at train time.
    """

    def __init__(self, embed_dim: int, num_heads: int, dropout: float = 0.0):
        super().__init__()
        self.embed_dim = embed_dim
        self.num_heads = num_heads
        self.head_dim = embed_dim // num_heads
        self.dropout_rate = dropout
        self.param("in_proj_weight", (3 * embed_dim, embed_dim), xavier_uniform_init())
        self.param("in_proj_bias", (3 * embed_dim,), zeros_init())
        out_proj = Linear(embed_dim, embed_dim, bias=True)
        # torch._reset_parameters zeroes the out_proj bias
        out_proj._params["bias"].init_fn = zeros_init()
        self.add("out_proj", out_proj)
        self.out_proj = out_proj

    def project_kv(self, p, key, value, quant: Optional[str] = None):
        """Precompute split-head K/V for a fixed memory (decode-time
        cross-attention: the encoder output never changes, so these
        projections run once per sequence instead of once per token).

        ``quant='int8'`` returns a :class:`QuantizedKV` instead — native
        int8 MXU dots at decode time read 2 bytes/element less HBM."""
        e = self.embed_dim
        w = p["in_proj_weight"].astype(key.dtype)
        b = p["in_proj_bias"].astype(key.dtype)
        k = key @ w[e:2 * e].T + b[e:2 * e]
        v = value @ w[2 * e:].T + b[2 * e:]

        def split_heads(t):
            return t.reshape(*t.shape[:-1], self.num_heads,
                             self.head_dim).swapaxes(-3, -2)

        k, v = split_heads(k), split_heads(v)
        if quant == "int8":
            kq, ks = quantize_rows_int8(k)
            vq, vs = quantize_rows_int8(v)
            return QuantizedKV(kq, ks, vq, vs)
        assert quant is None, f"unknown cross-KV quant mode {quant!r}"
        return k, v

    def forward(self, p, query, key, value, ctx: Ctx = Ctx(),
                precomputed_kv=None, **kwargs):
        e = self.embed_dim
        w = p["in_proj_weight"].astype(query.dtype)
        b = p["in_proj_bias"].astype(query.dtype)
        q = query @ w[:e].T + b[:e]

        def split_heads(t):
            return t.reshape(*t.shape[:-1], self.num_heads, self.head_dim).swapaxes(-3, -2)

        q = split_heads(q)
        if isinstance(precomputed_kv, QuantizedKV):
            # int8 serving path: only 1-byte K/V rows cross HBM; the dots
            # run MIXED-precision — fp q/probs against int8 K/V converted
            # in-register — with the per-position K/V scales factored out
            # of the d-sum exactly.  The round-4 form quantized q and the
            # probabilities too (full s8xs8 MXU dots): its extra VPU
            # quantize/scale passes cost MORE than the saved bandwidth and
            # it measured a net LOSS end-to-end (2,209 vs 2,281 captions/s,
            # BENCH_QUEUE_r04).  PROBE_CROSS_DECODE.jsonl round-5 rows:
            # full-int8 1.706 ms, bf16 exact 1.116, this mixed form 0.831
            # (batch 256, 12-layer chain) — and dropping the q/prob
            # roundings makes it strictly more accurate as well.
            assert not ctx.train, "quantized cross-KV is decode-only"
            kq, ks, vq, vs = precomputed_kv
            scores = jnp.einsum("...hqd,...hkd->...hqk", q,
                                kq.astype(q.dtype),
                                preferred_element_type=jnp.float32)
            scores = scores * ks[..., None, :] / math.sqrt(self.head_dim)
            probs = jax.nn.softmax(scores, axis=-1)
            # fold the per-position V scale into the probabilities (it
            # cannot be pulled out of the k-sum)
            pv = (probs * vs[..., None, :]).astype(q.dtype)
            y = jnp.einsum("...hqk,...hkd->...hqd", pv, vq.astype(q.dtype),
                           preferred_element_type=jnp.float32
                           ).astype(query.dtype)
            y = y.swapaxes(-3, -2).reshape(*query.shape[:-1], e)
            return self.out_proj(p["out_proj"], y)
        if precomputed_kv is not None:
            k, v = precomputed_kv
        else:
            k, v = self.project_kv(p, key, value)
        scores = jnp.einsum("...hqd,...hkd->...hqk", q, k,
                            preferred_element_type=jnp.float32)
        scores = scores / math.sqrt(self.head_dim)
        probs = jax.nn.softmax(scores, axis=-1).astype(query.dtype)
        probs, ctx = dropout(probs, self.dropout_rate, ctx)
        y = jnp.einsum("...hqk,...hkd->...hqd", probs, v,
                       preferred_element_type=jnp.float32).astype(query.dtype)
        y = y.swapaxes(-3, -2).reshape(*query.shape[:-1], e)
        return self.out_proj(p["out_proj"], y)
