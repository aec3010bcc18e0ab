"""Rematerialisation policy knob (TPU extension).

The reference exposes gradient checkpointing as a boolean per model
(encoder.py:174-176, decoder.py:251-252, HF path decoder.py:324-325);
``jax.checkpoint`` additionally takes a *policy* choosing which
intermediates to save instead of recompute.  The default (save only block
inputs, recompute everything in the backward) minimises memory; on TPU
the usual step-time win is ``dots``: MXU outputs (matmul results) are
saved and only the cheap VPU elementwise work is recomputed — a
memory↔recompute trade the boolean cannot express.

Policies are annotation-only for numerics: what is saved vs recomputed
cannot change values (pinned by
``tests/test_training.py::test_remat_policy_preserves_numerics``).
"""
from __future__ import annotations

from typing import Optional

import jax


def resolve_remat_policy(name: Optional[str]):
    """Policy name → jax.checkpoint policy callable (None = jax default:
    save block inputs only, recompute everything)."""
    if name in (None, "full"):
        return None
    if name == "dots":
        return jax.checkpoint_policies.dots_with_no_batch_dims_saveable
    if name == "nothing":
        return jax.checkpoint_policies.nothing_saveable
    if name == "everything":
        # saves everything == checkpointing off, but keeps the same code
        # path; useful for A/B-ing policy cost without a config reshape
        return jax.checkpoint_policies.everything_saveable
    raise ValueError(f"unknown remat_policy {name!r}; "
                     "expected full|dots|nothing|everything")


def set_remat_policy(model, name: Optional[str]) -> int:
    """Tag every checkpointing-capable module (scratch encoder/decoder and
    the HF backbones — anything carrying ``enable_gradient_checkpointing``)
    with the resolved policy; their per-block ``jax.checkpoint`` calls pick
    it up.  Returns the number of modules tagged."""
    pol = resolve_remat_policy(name)
    n = 0
    for m in model.walk():
        if hasattr(m, "enable_gradient_checkpointing"):
            m._remat_policy = pol
            n += 1
    return n
