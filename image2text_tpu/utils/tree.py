"""Flat-path utilities over nested param dicts.

The framework stores parameters as nested dicts of jax arrays whose
'.'-joined paths reproduce the reference's ``state_dict`` key names
(e.g. ``decoder.transformer.h.0.attn.c_attn.weight``).  That makes the
reference's fnmatch-based machinery (optimizer target_modules, partial
checkpoints, LoRA force-enable patterns) work verbatim.
"""
from __future__ import annotations

from typing import Any, Dict, Iterator, Mapping, Tuple


def flatten(tree: Mapping[str, Any], prefix: str = "") -> Dict[str, Any]:
    """Flatten a nested dict into {'a.b.c': leaf} form."""
    out: Dict[str, Any] = {}
    for key, value in tree.items():
        path = f"{prefix}.{key}" if prefix else key
        if isinstance(value, Mapping):
            out.update(flatten(value, path))
        else:
            out[path] = value
    return out


def unflatten(flat: Mapping[str, Any]) -> Dict[str, Any]:
    """Inverse of :func:`flatten`."""
    out: Dict[str, Any] = {}
    for path, value in flat.items():
        parts = path.split(".")
        node = out
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = value
    return out


def iter_paths(tree: Mapping[str, Any], prefix: str = "") -> Iterator[Tuple[str, Any]]:
    for key, value in tree.items():
        path = f"{prefix}.{key}" if prefix else key
        if isinstance(value, Mapping):
            yield from iter_paths(value, path)
        else:
            yield path, value


def tree_update(tree: Dict[str, Any], flat_updates: Mapping[str, Any]) -> Dict[str, Any]:
    """Return a copy of ``tree`` with flat-path leaves replaced.

    Mirrors the reference's tolerant partial-checkpoint restore
    (models/utils.py:31-36): unknown paths are inserted, existing paths
    overwritten, everything else left intact.
    """
    flat = flatten(tree)
    flat.update(flat_updates)
    return unflatten(flat)


def map_with_path(fn, tree: Mapping[str, Any], prefix: str = "") -> Dict[str, Any]:
    """Map ``fn(path, leaf) -> leaf`` over a nested dict, preserving structure."""
    out: Dict[str, Any] = {}
    for key, value in tree.items():
        path = f"{prefix}.{key}" if prefix else key
        if isinstance(value, Mapping):
            out[key] = map_with_path(fn, value, path)
        else:
            out[key] = fn(path, value)
    return out
