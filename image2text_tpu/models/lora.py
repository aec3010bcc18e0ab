"""First-party LoRA (low-rank adapters).

Replaces the reference's peft LoraModel wrapping (models/utils.py:46-65)
with in-tree adapter modules: matched Linear layers become
:class:`LoRALinear` — the frozen base weight keeps its original tree path
(``...c_attn.weight``) and adapters appear as ``...c_attn.lora_A.weight`` /
``...lora_B.weight``.  Unlike peft, no extra ``model.`` nesting is added, so
all reference wildcard patterns keep matching.

Freezing semantics mirror peft: every param in the wrapped subtree is
excluded from training except the adapters, and
``force_enable_update_modules`` fnmatch patterns re-enable params
(reference models/utils.py:60-64).
"""
from __future__ import annotations

import math
from typing import Optional

import jax

from image2text_tpu.configs.models import LoraSpec
from image2text_tpu.nn.core import Ctx, Module, dropout, normal_init, uniform_init, zeros_init
from image2text_tpu.nn.modules import Linear
from image2text_tpu.utils.patterns import PatternMatcher


class _LoRAMixin:
    """Adds adapters on top of any Linear-like base class: the base weight
    keeps its tree path; adapters appear as lora_A/lora_B children."""

    def _init_lora(self, r: int, lora_alpha: int, lora_dropout: float):
        self.r = r
        self.scaling = lora_alpha / r
        self.lora_dropout = lora_dropout
        # base params keep their ORIGINAL owner class so owner-based init
        # policies (e.g. the decoder's GPT-2 N(0,0.02) pass, decoder.py:148)
        # still see them as plain Linear/QuantizedLinear params
        base_owner = type(self).__mro__[2].__name__
        for spec in self._params.values():
            spec.owner = base_owner
        lora_a = Module()
        lora_a.param("weight", (r, self.in_features),
                     uniform_init(1.0 / math.sqrt(self.in_features)))
        self.add("lora_A", lora_a)
        lora_b = Module()
        lora_b.param("weight", (self.out_features, r), zeros_init())
        self.add("lora_B", lora_b)

    def forward(self, p, x, ctx: Ctx = Ctx(), **kwargs):
        y = super().forward(p, x)
        xd, ctx = dropout(x, self.lora_dropout, ctx)
        a = p["lora_A"]["weight"].astype(x.dtype)
        b = p["lora_B"]["weight"].astype(x.dtype)
        return y + (xd @ a.T @ b.T) * self.scaling


class LoRALinear(_LoRAMixin, Linear):
    """Linear with additive low-rank update: y = Wx + (alpha/r)·B(A·drop(x))."""

    def __init__(self, base: Linear, r: int, lora_alpha: int, lora_dropout: float):
        Linear.__init__(self, base.in_features, base.out_features,
                        bias=base.use_bias)
        self._init_lora(r, lora_alpha, lora_dropout)


def make_lora_wrapper(base, r: int, lora_alpha: int, lora_dropout: float):
    """Wrap any Linear subclass instance (incl. QuantizedLinear) with LoRA,
    preserving its class-specific params (e.g. int4 weight + scales)."""
    from image2text_tpu.models.quantization import QuantizedLinear

    if type(base) is QuantizedLinear:
        class LoRAQuantizedLinear(_LoRAMixin, QuantizedLinear):
            pass

        w = LoRAQuantizedLinear(base.in_features, base.out_features,
                                bias=base.use_bias)
        w._init_lora(r, lora_alpha, lora_dropout)
        return w
    if type(base) is Linear:
        return LoRALinear(base, r, lora_alpha, lora_dropout)
    raise TypeError(
        f"Don't know how to LoRA-wrap {type(base).__name__} without losing "
        "its class-specific params; add a wrapper class for it")


def _matches_target(path: str, targets) -> bool:
    """peft semantics: a plain target matches the module name at a segment
    boundary (key == t or key.endswith('.' + t)); glob targets fnmatch."""
    import fnmatch

    for t in targets:
        if any(ch in t for ch in "*?["):
            if fnmatch.fnmatch(path, t) or fnmatch.fnmatch(path, f"*.{t}"):
                return True
        elif path == t or path.endswith("." + t):
            return True
    return False


def apply_lora(module: Module, lora_spec: Optional[LoraSpec]) -> Module:
    """Wrap matched Linear children with adapters and freeze the base."""
    if lora_spec is None:
        return module

    n_wrapped = 0

    def walk(parent: Module, prefix: str):
        nonlocal n_wrapped
        for name, child in list(parent._children.items()):
            path = f"{prefix}.{name}" if prefix else name
            if isinstance(child, Linear) and not isinstance(child, _LoRAMixin) \
                    and (lora_spec.target_modules is None
                         or _matches_target(path, lora_spec.target_modules)):
                wrapped = make_lora_wrapper(child, lora_spec.r,
                                            lora_spec.lora_alpha,
                                            lora_spec.lora_dropout)
                parent._children[name] = wrapped
                n_wrapped += 1
                # keep python attribute references in sync when present
                for attr, val in list(parent.__dict__.items()):
                    if val is child:
                        setattr(parent, attr, wrapped)
            else:
                walk(child, path)

    walk(module, "")
    if n_wrapped == 0:
        # peft raises here too — otherwise the freeze below would silently
        # train NOTHING (every param frozen, no adapters)
        raise ValueError(
            f"Target modules {lora_spec.target_modules} not found in the "
            "model; nothing was LoRA-wrapped")
    module._lora_freeze_all = True
    if lora_spec.force_enable_update_modules is not None:
        module._force_enable = PatternMatcher(lora_spec.force_enable_update_modules)
    return module
