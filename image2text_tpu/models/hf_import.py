"""HF/torch checkpoint import surgery.

``import_gpt2_state_dict`` reproduces the reference's GPT-2 weight surgery
(decoder.py:71-117): Conv1D weights transpose into Linear layout, buffer
keys are skipped, ``loose`` tolerates missing/mismatched keys (the nano.yaml
path relies on this for its shorter wpe table).  The functions are pure
(state-dict in, params out) so they are testable offline against randomly
initialised HF models.
"""
from __future__ import annotations

from typing import Dict, Mapping

import jax.numpy as jnp
import numpy as np

from image2text_tpu.configs.models import ModelType
from image2text_tpu.utils.tree import flatten, unflatten

GPT2_TRANSPOSED = (
    "attn.c_attn.weight",
    "attn.c_proj.weight",
    "mlp.c_fc.weight",
    "mlp.c_proj.weight",
)


def _to_numpy(v) -> np.ndarray:
    if hasattr(v, "detach"):
        v = v.detach().cpu().numpy()
    return np.asarray(v)


def import_gpt2_state_dict(params: Dict, sd_hf: Mapping[str, "np.ndarray"],
                           loose: bool = False) -> Dict:
    """Copy a HF GPT2LMHeadModel state dict into a TransformerDecoder tree."""
    flat = flatten(params)
    consumed = set()
    for k, v in sd_hf.items():
        if k.endswith(".attn.masked_bias") or k.endswith(".attn.bias"):
            continue  # causal-mask buffers, not parameters
        v = _to_numpy(v)
        if any(k.endswith(w) for w in GPT2_TRANSPOSED):
            v = v.T
        if k == "lm_head.weight":
            k = "transformer.wte.weight"  # tied storage
        if k not in flat:
            if not loose:
                raise ValueError(f"{k} is not present in state dict!!!")
            continue
        if flat[k].shape == v.shape:
            flat[k] = jnp.asarray(v)
            consumed.add(k)
        elif k == "transformer.wte.weight" and flat[k].shape[0] > v.shape[0] \
                and flat[k].shape[1] == v.shape[1]:
            # vocab grew (extra special tokens): keep our init for new rows,
            # mirroring HF resize_token_embeddings + copy (decoder.py:72-75)
            flat[k] = flat[k].at[: v.shape[0]].set(jnp.asarray(v))
            consumed.add(k)
        elif not loose:
            raise ValueError(f"{k} is not the same shape in state dict!!!")
    if not loose:
        # the reverse direction of strictness: every base GPT-2 param in
        # OUR tree must have been filled (cross-attn/LoRA additions are
        # ours; a key subset that happens to shape-match must not silently
        # leave layers at random init)
        base = {p for p in flat
                if p.startswith(("transformer.wte.", "transformer.wpe.",
                                 "transformer.ln_f.", "transformer.h."))
                and ".crossattention." not in p and ".ln_cross_attn." not in p
                # the scratch TransformerDecoder's cross-attention naming
                # (reference layers.py:537-542: cross_attn + its ln_3)
                and ".cross_attn." not in p and ".ln_3." not in p
                and ".lora_A." not in p and ".lora_B." not in p}
        missing = sorted(base - consumed)
        if missing:
            raise ValueError(
                f"{len(missing)} base params missing from the GPT-2 state "
                f"dict (first: {missing[:4]}); refusing a partial strict "
                "import")
    return unflatten(flat)


def load_pretrained_gpt2_params(params: Dict, model_type: ModelType,
                                vocab_size: int, loose: bool) -> Dict:
    """Fetch HF GPT-2 weights (requires network/cache) and import them."""
    from transformers import GPT2LMHeadModel

    model_hf = GPT2LMHeadModel.from_pretrained(model_type.value)
    if vocab_size > model_hf.config.vocab_size:
        model_hf.resize_token_embeddings(vocab_size)
    sd = {k: _to_numpy(v) for k, v in model_hf.state_dict().items()}
    return import_gpt2_state_dict(params, sd, loose=loose)
