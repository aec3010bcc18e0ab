"""Parameter sharding rules: tensor parallelism over the mesh 'model' axis.

The reference has no parallelism beyond DDP (SURVEY §2.3); this is the
TPU-native extension for decoders too large for one chip's HBM.  TP here is
*sharding-annotation-only*: parameters get ``NamedSharding`` placements by
fnmatch rule (Megatron-style column/row splits of attention and MLP
projections), inputs stay data-sharded, and XLA inserts the all-reduces
over ICI — no hand-written collectives.

Linear weights are torch layout (out, in):
* column-parallel (shard the OUT dim, P('model', None)): QKV / gate / up /
  c_fc projections — each shard computes its slice of heads/neurons;
* row-parallel (shard the IN dim, P(None, 'model')): output projections
  (c_proj / o_proj / down_proj) — partial sums all-reduced by XLA.
* expert-parallel (shard the leading EXPERT axis of the natively-stacked
  MoE parameters): all experts evaluate locally on their shard and the
  top-k combine einsum's reduction over experts becomes an XLA psum;
* everything else (embeddings, norms, biases of row-parallel layers,
  encoder) stays replicated.
"""
from __future__ import annotations

import fnmatch
from typing import Dict

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from image2text_tpu.utils.tree import flatten, unflatten

# fnmatch pattern → 'col' (shard out dim) | 'row' (shard in dim)
TP_RULES = (
    # scratch decoder / HF GPT-2
    ("*attn.c_attn.weight", "col"),
    ("*attn.q_attn.weight", "col"),
    ("*attn.c_proj.weight", "row"),
    ("*mlp.c_fc.weight", "col"),
    ("*mlp.c_proj.weight", "row"),
    # scratch MQA
    ("*attn.q_proj.weight", "col"),
    ("*attn.out_proj.weight", "row"),
    # cross-attention (torch MultiheadAttention layout): packed qkv in_proj
    # column-split; out_proj covered by the *attn.out_proj.weight row rule
    ("*attn.in_proj_weight", "col"),
    # Llama/Qwen
    ("*self_attn.q_proj.weight", "col"),
    ("*self_attn.k_proj.weight", "col"),
    ("*self_attn.v_proj.weight", "col"),
    ("*self_attn.o_proj.weight", "row"),
    ("*mlp.gate_proj.weight", "col"),
    ("*mlp.up_proj.weight", "col"),
    ("*mlp.down_proj.weight", "row"),
    # Falcon
    ("*self_attention.query_key_value.weight", "col"),
    ("*self_attention.dense.weight", "row"),
    ("*mlp.dense_h_to_4h.weight", "col"),
    ("*mlp.dense_4h_to_h.weight", "row"),
    # MoE stacked experts: shard the expert axis — expert parallelism; the
    # top-k combine einsum reduces over it, XLA inserts the psum
    ("*.l1_weight", "expert"),
    ("*.l1_bias", "expert"),
    ("*.l2_weight", "expert"),
    ("*.l2_bias", "expert"),
)


def _spec_for(path: str, shape, model_size: int):
    # NOTE: specs are written in GSPMD-normal form (no trailing Nones):
    # P('model') and P('model', None) are the same placement but compare
    # UNEQUAL in jit's cache key, and XLA emits outputs in normal form —
    # a denormal input spec would force a silent retrace+recompile of the
    # train step on its second call (observed: 80s per extra compile on a
    # CPU host; a full flagship recompile on TPU).
    for pattern, kind in TP_RULES:
        if fnmatch.fnmatch(path, pattern):
            if kind == "col" and len(shape) == 2 and shape[0] % model_size == 0:
                return P("model")
            if kind == "row" and len(shape) == 2 and shape[1] % model_size == 0:
                return P(None, "model")
            if kind == "expert" and shape[0] % model_size == 0:
                return P("model")
            return P()  # indivisible: replicate rather than fail
    # biases of column-parallel layers follow their weight's out split
    if path.endswith("bias"):
        wpath = path[: -len("bias")] + "weight"
        for pattern, kind in TP_RULES:
            if kind == "col" and fnmatch.fnmatch(wpath, pattern) \
                    and len(shape) == 1 and shape[0] % model_size == 0:
                return P("model")
    return P()


def tp_param_shardings(params, mesh: Mesh) -> Dict:
    """Pytree of NamedShardings mirroring ``params`` (replicated where no
    rule applies or the mesh has no model axis)."""
    model_size = mesh.shape.get("model", 1)
    flat = flatten(params)
    out = {}
    for path, value in flat.items():
        spec = _spec_for(path, value.shape, model_size) if model_size > 1 \
            else P()
        out[path] = NamedSharding(mesh, spec)
    return unflatten(out)


def place_params(params, mesh: Mesh):
    """device_put the parameter tree with TP shardings."""
    shardings = tp_param_shardings(params, mesh)
    return jax.tree_util.tree_map(jax.device_put, params, shardings)


def set_sequence_parallel(model, mesh: Mesh) -> int:
    """Tag every transformer block for Megatron-style sequence parallelism.

    SP here is annotation-only, like TP: tagged blocks constrain their
    (batch, seq, embd) residual stream to ``P('data', 'model')`` at block
    boundaries (see ``nn.core.sp_constrain``).  GSPMD then reduce-scatters
    the row-parallel projection outputs instead of all-reducing them and
    all-gathers the sequence again before the next column-parallel matmul —
    identical ICI bytes, but the residual stream, LayerNorm intermediates,
    and (critically) the remat-saved per-block inputs shrink by the TP
    degree.  Training-only: cached decode keeps its single-profile layout.

    Returns the number of blocks tagged (0 when the model has no
    recognised block class, or the mesh no model axis — callers may warn).
    """
    from image2text_tpu.models.hf_decoders.falcon import _FalconBlock
    from image2text_tpu.models.hf_decoders.gpt2 import _GPT2Block
    from image2text_tpu.models.hf_decoders.llama import _LlamaBlock
    from image2text_tpu.models.layers import TransformerBlock

    if mesh.shape.get("model", 1) <= 1:
        return 0
    sh = NamedSharding(mesh, P("data", "model"))
    n = 0
    for m in model.walk():
        if isinstance(m, (TransformerBlock, _GPT2Block, _LlamaBlock,
                          _FalconBlock)):
            m._sp_sharding = sh
            n += 1
    return n


def zero_opt_state_shardings(opt_state, mesh: Mesh,
                             min_size: int = 16384):
    """ZeRO-1-style placements for optimizer moments: shard over 'data'.

    The reference has nothing like this (accelerate DDP replicates Adam
    moments on every rank); on TPU the idiomatic form is pure sharding
    annotation — each large replicated moment leaf gets
    ``P('data', None, …)`` and XLA turns the weight-update math into
    per-shard compute followed by an all-gather of the (small) updates
    over ICI, cutting optimizer HBM by the data-parallel degree.

    Rules per leaf: floating arrays only; leading axis divisible by the
    data-axis size; at least ``min_size`` elements (tiny tensors aren't
    worth a collective); leaves that already carry a TP sharding (their
    param was model-sharded, inherited through ``tx.init``'s zeros_like)
    are left alone.  Returns a matching pytree of NamedShardings.
    """
    import jax.numpy as jnp

    data = mesh.shape.get("data", 1)

    def rule(leaf):
        repl = NamedSharding(mesh, P())
        if not hasattr(leaf, "shape") or leaf.ndim < 1:
            return repl
        if not jnp.issubdtype(leaf.dtype, jnp.floating):
            return repl
        sh = getattr(leaf, "sharding", None)
        if isinstance(sh, NamedSharding) and any(sh.spec):
            return sh  # TP-sharded moment: keep
        if leaf.size < min_size or leaf.shape[0] % data != 0:
            return repl
        return NamedSharding(mesh, P("data"))  # GSPMD-normal form

    return jax.tree_util.tree_map(rule, opt_state)
