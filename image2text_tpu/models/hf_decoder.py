"""HF-pretrained decoder family (GPT-2 / Falcon / Llama-2 / Qwen-2).

First-party JAX decoder stacks with HF-checkpoint importers, replacing the
reference's AutoModelForCausalLM wrappers (decoder.py:285-441).  Implemented
in a later milestone of this build; the factory hook exists now so configs
resolve to a clear error instead of silently misbehaving.
"""
from __future__ import annotations

from image2text_tpu.configs.models import HuggingfaceDecoderConfig


def hf_decoder_from_config(config: HuggingfaceDecoderConfig):
    from image2text_tpu.models.hf_decoders.factory import build_hf_decoder

    return build_hf_decoder(config)
