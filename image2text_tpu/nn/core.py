"""Minimal functional module system for TPU-native models.

Design goals (vs. porting torch.nn or adopting flax.linen wholesale):

* **Pure pytrees**: parameters are nested dicts of jax arrays.  A module is
  a static Python object built once from config; ``init(key)`` materialises
  the parameter tree and ``module(params, ...)`` is a pure function — safe
  under ``jax.jit``/``pjit``/``jax.checkpoint``/``shard_map``.
* **torch-style naming**: '.'-joined tree paths reproduce the reference's
  ``state_dict`` keys, so its fnmatch config patterns and partial
  checkpoints apply verbatim (reference: models/utils.py:18-36,
  trainer.py:145-167).
* **torch-style layouts**: Linear weights are (out, in), Conv weights
  (out, in, kh, kw), Embedding (num, dim) — so weight import from HF/torch
  checkpoints is copy-through.  XLA contracts transposed layouts on the MXU
  natively; there is no runtime cost.

Randomness/training mode are threaded through an explicit immutable
:class:`Ctx`, keeping every forward pass deterministic given its rng.
"""
from __future__ import annotations

import math
import zlib
from dataclasses import dataclass
from typing import Any, Callable, Dict, Iterable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _path_key(key: jax.Array, path: str) -> jax.Array:
    """Derive a deterministic per-path rng key (stable across tree order)."""
    return jax.random.fold_in(key, zlib.crc32(path.encode()) & 0x7FFFFFFF)


# ---------------------------------------------------------------------------
# Initializers (shape -> array).  Signatures: fn(key, shape, dtype).
# ---------------------------------------------------------------------------

def normal_init(std: float = 0.02, mean: float = 0.0):
    def fn(key, shape, dtype):
        return mean + std * jax.random.normal(key, shape, dtype)
    return fn


def zeros_init():
    return lambda key, shape, dtype: jnp.zeros(shape, dtype)


def ones_init():
    return lambda key, shape, dtype: jnp.ones(shape, dtype)


def uniform_init(bound: float):
    def fn(key, shape, dtype):
        return jax.random.uniform(key, shape, dtype, -bound, bound)
    return fn


def torch_linear_weight_init(fan_in: int):
    """torch.nn.Linear default: kaiming_uniform(a=sqrt(5)) == U(±1/sqrt(fan_in))."""
    return uniform_init(1.0 / math.sqrt(fan_in)) if fan_in > 0 else zeros_init()


def xavier_uniform_init():
    def fn(key, shape, dtype):
        fan_out, fan_in = shape[0], shape[1] if len(shape) > 1 else shape[0]
        bound = math.sqrt(6.0 / (fan_in + fan_out))
        return jax.random.uniform(key, shape, dtype, -bound, bound)
    return fn


def scaled_normal_init(std: float):
    return normal_init(std=std)


# ---------------------------------------------------------------------------
# Ctx: rng + train-mode threading
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class Ctx:
    """Immutable forward-pass context: rng stream + train flag."""

    rng: Optional[jax.Array] = None
    train: bool = False

    def split(self) -> Tuple["Ctx", jax.Array]:
        if self.rng is None:
            raise ValueError("Ctx has no rng but randomness was requested")
        k_next, k_use = jax.random.split(self.rng)
        return Ctx(rng=k_next, train=self.train), k_use

    def fold(self, data: int) -> "Ctx":
        if self.rng is None:
            return self
        return Ctx(rng=jax.random.fold_in(self.rng, data), train=self.train)


EVAL_CTX = Ctx(rng=None, train=False)


def sp_constrain(module: "Module", x: jax.Array, ctx: Ctx,
                 kv_cache=None) -> jax.Array:
    """Megatron-style sequence-parallel residual annotation (training only).

    When :func:`parallel.sharding_rules.set_sequence_parallel` has tagged
    this block with a ``_sp_sharding`` (``P('data', 'model')`` over the
    mesh), constrain the (batch, seq, embd) residual stream to it at the
    block boundary: GSPMD then turns the tensor-parallel all-reduce after
    row-parallel projections into reduce-scatter + all-gather pairs (same
    bytes over ICI) and every remat-saved block input — the dominant
    activation-memory term under per-block ``jax.checkpoint`` — shrinks by
    the TP degree.  Annotation-only: numerics are unchanged (pinned by
    ``test_sequence_parallel_matches_data_parallel``).  Skipped outside
    training, in cached decode, and when shapes don't divide the mesh.
    """
    sh = getattr(module, "_sp_sharding", None)
    if sh is None or not ctx.train or kv_cache is not None or x.ndim != 3:
        return x
    if (x.shape[0] % sh.mesh.shape.get("data", 1)
            or x.shape[1] % sh.mesh.shape.get("model", 1)):
        return x
    return jax.lax.with_sharding_constraint(x, sh)


def dropout(x: jax.Array, rate: float, ctx: Ctx) -> Tuple[jax.Array, Ctx]:
    """Inverted dropout; identity when eval or rate==0. Returns (y, ctx')."""
    if not ctx.train or rate <= 0.0:
        return x, ctx
    ctx, key = ctx.split()
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, keep, x.shape)
    return jnp.where(mask, x / keep, jnp.zeros_like(x)), ctx


# ---------------------------------------------------------------------------
# Module
# ---------------------------------------------------------------------------

@dataclass
class ParamSpec:
    shape: Tuple[int, ...]
    init_fn: Callable
    dtype: Any = jnp.float32
    owner: str = ""  # owning module class name, for post-hoc init policies
    name: str = ""   # leaf name ('weight', 'bias', ...)


class Module:
    """Base class: declare params/buffers/children in __init__, pure forward.

    Subclasses implement ``forward(self, p, *args, ctx)`` where ``p`` is this
    module's parameter subtree (a dict).  Children are invoked as
    ``self.child(p['child'], ...)``.
    """

    def __init__(self) -> None:
        self._params: Dict[str, ParamSpec] = {}
        self._buffers: Dict[str, np.ndarray] = {}
        self._children: Dict[str, "Module"] = {}
        self._frozen: set = set()          # local param names frozen out of training
        self._lora_freeze_all: bool = False  # freeze entire subtree except lora_*
        self._force_enable = None          # PatternMatcher re-enabling frozen paths
        # checkpoint split specs: {stacked_param_name: (template, count)} —
        # a stacked leading-axis param that serialises as `count`
        # reference-style keys via template.format(i=...) (e.g. MoE experts)
        self._split_specs: Dict[str, Tuple[str, int]] = {}

    # -- declaration -------------------------------------------------------
    def param(self, name: str, shape: Iterable[int], init_fn: Callable,
              dtype: Any = jnp.float32) -> None:
        self._params[name] = ParamSpec(tuple(shape), init_fn, dtype,
                                       owner=type(self).__name__, name=name)

    def buffer(self, name: str, value: np.ndarray) -> None:
        self._buffers[name] = np.asarray(value)

    def add(self, name: str, module: "Module") -> "Module":
        self._children[name] = module
        return module

    # -- materialisation ---------------------------------------------------
    def init(self, key: jax.Array, path: str = "") -> Dict[str, Any]:
        """Build this module's parameter tree (params + buffers)."""
        out: Dict[str, Any] = {}
        for name, spec in self._params.items():
            p = f"{path}.{name}" if path else name
            out[name] = spec.init_fn(_path_key(key, p), spec.shape, spec.dtype)
        for name, value in self._buffers.items():
            out[name] = jnp.asarray(value)
        for name, child in self._children.items():
            p = f"{path}.{name}" if path else name
            sub = child.init(key, p)
            if sub:
                out[name] = sub
        return out

    # -- introspection -----------------------------------------------------
    def param_specs(self, path: str = "") -> Dict[str, ParamSpec]:
        """Flat {path: ParamSpec} over the whole subtree (params only)."""
        out: Dict[str, ParamSpec] = {}
        for name, spec in self._params.items():
            out[f"{path}.{name}" if path else name] = spec
        for name, child in self._children.items():
            out.update(child.param_specs(f"{path}.{name}" if path else name))
        return out

    def buffer_paths(self, path: str = "") -> List[str]:
        out = [f"{path}.{n}" if path else n for n in self._buffers]
        for name, child in self._children.items():
            out.extend(child.buffer_paths(f"{path}.{name}" if path else name))
        return out

    def freeze(self, *names: str) -> None:
        self._frozen.update(names)

    def frozen_param_paths(self, path: str = "") -> List[str]:
        """Flat paths of params excluded from training (torch requires_grad
        parity: LoRA-frozen bases, etc.).  ``force_enable`` patterns
        (reference models/utils.py:60-64) re-enable matches."""
        out: List[str] = []
        if self._lora_freeze_all:
            for p in self.param_specs(path):
                if ".lora_A." not in p and ".lora_B." not in p:
                    out.append(p)
        else:
            for name in self._params:
                if name in self._frozen:
                    out.append(f"{path}.{name}" if path else name)
            for name, child in self._children.items():
                out.extend(child.frozen_param_paths(f"{path}.{name}" if path else name))
        if self._force_enable is not None:
            # match against both the fully-prefixed path and the path
            # relative to this module, so patterns written in the reference
            # convention (decoder-relative names) re-enable params even when
            # the wrapper/composite adds 'model.decoder.' prefixes
            def enabled(p: str) -> bool:
                rel = p[len(path) + 1:] if path and p.startswith(path + ".") \
                    else p
                return self._force_enable.match(p) or \
                    self._force_enable.match(rel)
            out = [p for p in out if not enabled(p)]
        return out

    def split_specs(self, path: str = "") -> Dict[str, Tuple[str, int]]:
        """Flat {stacked_param_path: (key_template_path, count)} subtree-wide."""
        out: Dict[str, Tuple[str, int]] = {}
        for name, (template, count) in self._split_specs.items():
            p = f"{path}.{name}" if path else name
            t = f"{path}.{template}" if path else template
            out[p] = (t, count)
        for name, child in self._children.items():
            out.update(child.split_specs(f"{path}.{name}" if path else name))
        return out

    def walk(self):
        """Depth-first iterator over this module and every submodule."""
        yield self
        for child in self._children.values():
            yield from child.walk()

    def module_at(self, path: str) -> "Module":
        node: Module = self
        if path:
            for part in path.split("."):
                node = node._children[part]
        return node

    # -- forward -----------------------------------------------------------
    def forward(self, p, *args, **kwargs):  # pragma: no cover - abstract
        raise NotImplementedError(type(self).__name__)

    def __call__(self, p, *args, **kwargs):
        return self.forward(p, *args, **kwargs)


class Identity(Module):
    def forward(self, p, x, **kwargs):
        return x


class ModuleList(Module):
    """Children named '0', '1', ... to mirror torch.nn.ModuleList paths."""

    def __init__(self, modules: Iterable[Module] = ()) -> None:
        super().__init__()
        self._list: List[Module] = []
        for m in modules:
            self.append(m)

    def append(self, module: Module) -> None:
        self.add(str(len(self._list)), module)
        self._list.append(module)

    def __len__(self) -> int:
        return len(self._list)

    def __iter__(self):
        return iter(self._list)

    def __getitem__(self, idx: int) -> Module:
        return self._list[idx]


class ModuleDict(Module):
    """Named children container (torch.nn.ModuleDict analog)."""

    def __init__(self, modules: Optional[Dict[str, Module]] = None) -> None:
        super().__init__()
        for name, m in (modules or {}).items():
            self.add(name, m)

    def __getattr__(self, name: str):
        children = self.__dict__.get("_children", {})
        if name in children:
            return children[name]
        raise AttributeError(name)

    def __getitem__(self, name: str) -> Module:
        return self._children[name]
