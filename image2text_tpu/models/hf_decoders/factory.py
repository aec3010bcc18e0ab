"""Dispatch HF decoder configs to first-party JAX implementations."""
from __future__ import annotations

from image2text_tpu.configs.models import HuggingfaceDecoderConfig


def build_hf_decoder(config: HuggingfaceDecoderConfig):
    raise NotImplementedError(
        "HF decoder family lands in a later milestone of this build; "
        f"requested model_str={config.model_str!r}")
