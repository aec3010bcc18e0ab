"""Checkpoint save/restore with torch-state_dict-shaped flat keys.

Parity features (reference: models/utils.py:31-36, training/utils.py:111-123):

* flat '.'-joined keys identical to the reference's ``state_dict`` names,
  including duplicated tied-weight aliases (``lm_head.weight``);
* tolerant *partial* restore — the checkpoint updates whatever keys it has;
* pattern-filtered *partial* save for fine-tuning runs (only params matched
  by the optimizer's target_modules get written);
* local paths or URIs via ``smart_open`` when available.

Format is numpy ``.npz`` (zip of arrays keyed by path) — portable, no torch
dependency.  Orbax-based full-train-state checkpointing for resume lives in
training/loop.py; this module covers model-weight interchange.
"""
from __future__ import annotations

import io
import os
from typing import Dict, Iterable, List, Optional

import jax.numpy as jnp
import numpy as np

from image2text_tpu.nn.core import Module
from image2text_tpu.utils.patterns import PatternMatcher
from image2text_tpu.utils.tree import flatten, unflatten


def _open(path: str, mode: str):
    if "://" in path and not path.startswith("file://"):
        try:
            from smart_open import open as smart_open  # type: ignore

            return smart_open(path, mode)
        except ImportError as e:  # pragma: no cover
            raise ValueError(
                f"cloud URI {path!r} requires smart_open, which is not "
                "installed in this environment") from e
    if path.startswith("file://"):
        path = path[len("file://"):]
    if "w" in mode:
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    return open(path, mode)


def collect_tied_aliases(module: Module, prefix: str = "") -> Dict[str, str]:
    """Gather {alias_path: source_path} from modules defining
    ``tied_aliases`` (e.g. the decoder's lm_head↔wte tying)."""
    out: Dict[str, str] = {}
    aliases = getattr(module, "tied_aliases", None)
    if aliases:
        for alias, source in aliases.items():
            a = f"{prefix}.{alias}" if prefix else alias
            s = f"{prefix}.{source}" if prefix else source
            out[a] = s
    for name, child in module._children.items():
        out.update(collect_tied_aliases(child, f"{prefix}.{name}" if prefix else name))
    return out


def _to_host(v) -> np.ndarray:
    """Materialise a (possibly mesh-sharded) array on the host.

    ``np.asarray`` alone crashes on arrays that are not fully addressable
    (TP-sharded params under a multi-host mesh): gather such arrays across
    processes first.  Fully-addressable sharded arrays (single-process TP)
    assemble directly."""
    import jax

    if isinstance(v, jax.Array) and not v.is_fully_addressable:
        from jax.experimental import multihost_utils

        v = multihost_utils.process_allgather(v, tiled=True)
    return np.asarray(v)


def export_state_dict(module: Module, params: Dict) -> Dict[str, np.ndarray]:
    """Flatten params to torch-style names, materialising tied aliases and
    splitting stacked params (e.g. MoE experts) into their reference-style
    per-index keys.  Sharded params are gathered to the host first."""
    flat = {k: _to_host(v) for k, v in flatten(params).items()}
    for stacked, (template, count) in module.split_specs().items():
        if stacked in flat:
            arr = flat.pop(stacked)
            for i in range(count):
                flat[template.format(i=i)] = arr[i]
    for alias, source in collect_tied_aliases(module).items():
        if source in flat:
            flat[alias] = flat[source]
    return flat


def save_checkpoint(module: Module, params: Dict, path: str,
                    matchers: Optional[List[PatternMatcher]] = None) -> None:
    """Write a (optionally pattern-filtered) flat checkpoint.

    Multi-host invariant: EVERY process must call this function.  The
    ``export_state_dict`` gather below runs ``process_allgather`` — a
    cross-process *collective* — for any non-fully-addressable param
    (replicated or sharded over a multi-host mesh).  Only process 0 writes
    the file; a rank-0 gate *around* the call would leave the other
    processes out of the collective and deadlock rank 0."""
    import jax

    sd = export_state_dict(module, params)
    if jax.process_index() != 0:
        return
    if matchers:
        buffers = set(module.buffer_paths())
        sd = {k: v for k, v in sd.items()
              if k in buffers or any(m.match(k) for m in matchers)}
    buf = io.BytesIO()
    np.savez(buf, **sd)
    with _open(path, "wb") as f:
        f.write(buf.getvalue())


def load_state_dict(path: str) -> Dict[str, np.ndarray]:
    with _open(path, "rb") as f:
        data = f.read()
    with np.load(io.BytesIO(data)) as npz:
        return {k: npz[k] for k in npz.files}


def update_params_from_partial_checkpoint(module: Module, params: Dict,
                                          path: str) -> Dict:
    """Tolerant partial restore: checkpoint keys overwrite the current tree,
    everything else keeps its initialisation (reference models/utils.py:31-36).

    Tied aliases resolve to their source param; unknown keys are an error
    (like torch strict load on the updated full dict)."""
    sd = load_state_dict(path)
    flat = flatten(params)
    aliases = collect_tied_aliases(module)
    # reverse map for stacked params: per-index key -> (stacked path, index)
    joins = {}
    for stacked, (template, count) in module.split_specs().items():
        for i in range(count):
            joins[template.format(i=i)] = (stacked, i)
    for k, v in sd.items():
        k = aliases.get(k, k)
        if k in joins:
            stacked, i = joins[k]
            if tuple(flat[stacked].shape[1:]) != tuple(v.shape):
                raise ValueError(
                    f"shape mismatch for {k}: {flat[stacked].shape[1:]} "
                    f"vs {v.shape}")
            flat[stacked] = flat[stacked].at[i].set(jnp.asarray(v))
            continue
        if k not in flat:
            raise KeyError(f"checkpoint key {k!r} not present in model")
        if tuple(flat[k].shape) != tuple(v.shape):
            raise ValueError(f"shape mismatch for {k}: {flat[k].shape} vs {v.shape}")
        flat[k] = jnp.asarray(v)
    return unflatten(flat)
