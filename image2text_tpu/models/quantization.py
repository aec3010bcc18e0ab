"""Blockwise int4 quantization for frozen decoder weights.

TPU-native replacement for the reference's bitsandbytes NF4 path
(models/decoder.py:292-300, configs ``load_in_4bit`` /
``prepare_for_kbit_training``): frozen weights are stored PACKED — two
blockwise-absmax int4 values per byte (true 4-bit memory, like NF4) with
fp32 per-block scales — and the matmul runs through the Pallas fused
dequant-matmul kernel (ops/int4_matmul.py), which unpacks + dequantises
weight tiles in VMEM so the float weight matrix never exists in HBM.
An XLA unpack+dot fallback covers shapes the kernel declines.

Quantized weights are frozen by construction (they are integer params the
optimizer must never touch); training happens through LoRA adapters on
top, matching the kbit-training recipe.
"""
from __future__ import annotations

from typing import Dict, Iterable

import jax
import jax.numpy as jnp
import numpy as np

from image2text_tpu.nn.core import Ctx, Module, zeros_init
from image2text_tpu.nn.modules import Linear
from image2text_tpu.ops.int4_matmul import QBLOCK


def quantize_blockwise(w: np.ndarray, block: int = QBLOCK):
    """(out, in) float → PACKED uint8 (out, in_pad/2) + fp32 scales
    (out, in_pad/block), paired-strip layout (ops/int4_matmul.py)."""
    from image2text_tpu.ops.int4_matmul import quantize_pack_int4

    assert block == QBLOCK
    return quantize_pack_int4(w)


def dequantize_blockwise(packed: jax.Array, scales: jax.Array,
                         in_features: int, dtype=jnp.float32) -> jax.Array:
    """XLA fallback: unpack + scale back to a float weight matrix."""
    from image2text_tpu.ops.int4_matmul import dequantize_int4

    return dequantize_int4(packed, scales, dtype)[:, :in_features]


class QuantizedLinear(Linear):
    """Linear with packed blockwise-int4 frozen weight (bias stays fp32).

    Matmul runs the Pallas fused dequant-matmul kernel; tiny inputs (e.g.
    single-token decode) use the XLA unpack+dot fallback where tiling
    overhead would dominate."""

    def __init__(self, in_features: int, out_features: int, bias: bool = True,
                 block: int = QBLOCK):
        Module.__init__(self)
        self.in_features = in_features
        self.out_features = out_features
        self.use_bias = bias
        in_pad = (in_features + block - 1) // block * block
        self.in_pad = in_pad
        self.param("weight", (out_features, in_pad // 2),
                   lambda key, shape, dtype: jnp.zeros(shape, jnp.uint8),
                   dtype=jnp.uint8)
        self.param("weight_scales", (out_features, in_pad // block),
                   zeros_init())
        if bias:
            self.param("bias", (out_features,), zeros_init())
        self.freeze("weight", "weight_scales")

    def forward(self, p, x, ctx: Ctx = Ctx(), **kwargs):
        n_rows = int(np.prod(x.shape[:-1]))
        if n_rows >= 8:
            from image2text_tpu.ops.int4_matmul import int4_matmul

            xp = x if self.in_pad == self.in_features else jnp.pad(
                x, [(0, 0)] * (x.ndim - 1)
                + [(0, self.in_pad - self.in_features)])
            y = int4_matmul(xp, p["weight"], p["weight_scales"])
        else:
            w = dequantize_blockwise(p["weight"], p["weight_scales"],
                                     self.in_features, x.dtype)
            y = jax.lax.dot_general(
                x, w, dimension_numbers=(((x.ndim - 1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32).astype(x.dtype)
        if self.use_bias:
            y = y + p["bias"].astype(x.dtype)
        return y


def quantize_module_structure(module: Module,
                              skip_paths: Iterable[str] = ()) -> None:
    """Swap every plain Linear in the subtree for QuantizedLinear (structure
    only, before init; run BEFORE apply_lora so adapters wrap the quantized
    base).  Embeddings/layernorms/lm_head are not Linear children and are
    untouched."""
    skip = tuple(skip_paths)

    def walk(parent: Module, prefix: str):
        for name, child in list(parent._children.items()):
            path = f"{prefix}.{name}" if prefix else name
            if any(s in path for s in skip):
                continue
            if type(child) is Linear:
                qlin = QuantizedLinear(child.in_features, child.out_features,
                                       bias=child.use_bias)
                parent._children[name] = qlin
                for attr, val in list(parent.__dict__.items()):
                    if val is child:
                        setattr(parent, attr, qlin)
            else:
                walk(child, path)

    walk(module, "")


def int8_serving_params(module: Module, params: Dict,
                        min_elems: int = 1 << 18) -> Dict:
    """W8A8 serving transform: returns a copy of ``module``'s param tree
    where every sizeable ``Linear``/``Embedding`` weight becomes ``qweight``
    int8 rows + ``qscale`` per-row fp32 scales + a zero-length ``qdtype``
    marker carrying the original storage dtype (so gather-style dequants
    return bf16 rows in a bf16 serving graph instead of upcasting the
    whole decode to f32).  nn.modules.Linear/Embedding and the lm-head
    dots (scratch decoder + HF factory) dispatch on that form at run time,
    so the transform composes with generate()/beam search unchanged.

    The walk is typed on the MODULE tree (exactly ``Linear``/``Embedding``
    nodes, not shape heuristics): structurally identical param dicts whose
    forward does not dispatch on the form — CosineLinear, LoRA adapters,
    already-quantized int4 Linears — are never rewritten.

    Lossy (two int8 roundings per matmul) — a SERVING mode like the int8
    cross-KV option, never a training path.  ``min_elems`` keeps small,
    precision-sensitive weights (MoE gates, LoRA adapters) in float.
    Apply to the decoder subtree: the encoder runs once per caption while
    the decoder re-reads its weights every decode step."""
    from image2text_tpu.nn.modules import Embedding, quantize_rows_int8

    def quantize_node(p):
        w = p.get("weight")
        if (w is None or getattr(w, "ndim", 0) != 2
                or not jnp.issubdtype(w.dtype, jnp.floating)
                or w.size < min_elems):
            return p
        qw, qs = quantize_rows_int8(w)
        out = {k: v for k, v in p.items() if k != "weight"}
        out["qweight"], out["qscale"] = qw, qs
        out["qdtype"] = jnp.zeros((0,), w.dtype)
        return out

    def walk(mod: Module, p):
        if not isinstance(p, dict):
            return p
        out = dict(p)
        for name, child in mod._children.items():
            if name not in p:
                continue
            if type(child) in (Linear, Embedding):
                out[name] = quantize_node(p[name])
            else:
                out[name] = walk(child, p[name])
        return out

    return walk(module, params)


def assign_imported(flat: Dict, key: str, value: np.ndarray) -> bool:
    """Assign an imported float tensor into ``flat[key]``, quantizing on the
    fly when the destination is an int4 weight (the HF checkpoint stores fp;
    bitsandbytes parity).  Returns False on unhandled shape mismatch."""
    dst = flat[key]
    value = np.asarray(value)
    if dst.dtype == jnp.uint8 and key.endswith("weight"):
        q, s = quantize_blockwise(value)
        if q.shape != dst.shape:
            return False
        flat[key] = jnp.asarray(q)
        flat[key[: -len("weight")] + "weight_scales"] = jnp.asarray(s)
        return True
    if tuple(dst.shape) == tuple(value.shape):
        flat[key] = jnp.asarray(value)
        return True
    return False
