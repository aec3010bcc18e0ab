"""Output records (reference: object_models.py)."""
from typing import NamedTuple

import jax


class VisionEncoderDecoderModelOutput(NamedTuple):
    """Enables encoder-output reuse across decode steps (reference
    object_models.py:4-5)."""

    encoder_output: jax.Array
    logits: jax.Array
    hidden_state: jax.Array
