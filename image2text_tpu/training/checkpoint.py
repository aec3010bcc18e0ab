"""Full train-state checkpointing (orbax) for resume.

The reference never saves optimizer/step/RNG state — "resume" means
re-finetuning from model weights (SURVEY §5.4).  This module exceeds that:
the entire TrainState (params incl. EMA teacher, optax state, step counter)
round-trips through orbax, so training resumes bit-exactly.  Model-weight
interchange (partial, pattern-filtered, torch-shaped names) stays in
utils/checkpoint.py.
"""
from __future__ import annotations

import os
from typing import Any

import jax


def save_train_state(path: str, state: Any) -> None:
    """Write the TrainState pytree to ``path`` (a directory)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, state, force=True)


def restore_train_state(path: str, state_like: Any) -> Any:
    """Restore a TrainState saved by :func:`save_train_state`.

    ``state_like`` provides the pytree structure/shardings (an existing
    freshly-initialised TrainState)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct,
                                      state_like)
    with ocp.PyTreeCheckpointer() as ckptr:
        return ckptr.restore(path, item=abstract)
