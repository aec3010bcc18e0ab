"""Optimizers: SNRAdam and PatternMatcher-driven multi-group assembly.

* :func:`snr_adam` — optax GradientTransformation reproducing the
  reference's SNRAdam exactly (models/optimizer.py:7-113), including the
  ``iter==1`` branch, the use of the *pre-update* first moment for the
  variance estimate, the *post-update* bias-corrected first moment in the
  numerator, and decoupled ``p *= 1 − lr·wd`` weight decay.  Rationale: the
  denominator is the bias-corrected *std-dev* of the gradient, so
  consistent gradients take larger steps.
* :func:`build_optimizer` — per-group lr/wd/betas via fnmatch patterns
  (reference trainer.py:145-172): each OptimizerConfig's ``target_modules``
  match against parameter paths with the leading component stripped,
  ``model_m.*`` (EMA teacher) and LoRA-frozen params are never optimized.
  Assembled with ``optax.multi_transform``; unmatched params get zero
  updates.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax

from image2text_tpu.configs.trainer import OptimizerConfig
from image2text_tpu.utils.patterns import PatternMatcher
from image2text_tpu.utils.tree import flatten, unflatten


def snr_adam(lr: float, betas: Tuple[float, float] = (0.9, 0.999),
             weight_decay: float = 0.0,
             eps: float = 1e-8) -> optax.GradientTransformation:
    b1, b2 = betas

    def init_fn(params):
        zeros = lambda: jax.tree_util.tree_map(jnp.zeros_like, params)
        return {"iter": jnp.ones((), jnp.int32), "exp_avg": zeros(),
                "exp_avg_sq": zeros()}

    def update_fn(grads, state, params):
        it = state["iter"]
        itf = it.astype(jnp.float32)
        tm = jax.tree_util.tree_map

        # variance uses the bias-corrected *previous* first moment
        # (reference optimizer.py:98-102); at iter 1 the correction divides
        # by zero, hence the dedicated branch
        def new_v(g, m, v):
            g = g.astype(jnp.float32)
            d = jnp.where(it == 1, g, g - m / (1.0 - b1 ** (itf - 1.0)))
            return b2 * v + (1.0 - b2) * d * d

        def new_m(g, m):
            return b1 * m + (1.0 - b1) * g.astype(jnp.float32)

        def step(g, p, m2, v2):
            s = -lr * (m2 / (1.0 - b1 ** itf)) / (
                jnp.sqrt(v2 / (1.0 - b2 ** itf)) + eps)
            if weight_decay != 0.0:
                s = s - lr * weight_decay * p.astype(jnp.float32)
            return s.astype(p.dtype)

        v = tm(new_v, grads, state["exp_avg"], state["exp_avg_sq"])
        m = tm(new_m, grads, state["exp_avg"])
        steps = tm(step, grads, params, m, v)
        return steps, {"iter": it + 1, "exp_avg": m, "exp_avg_sq": v}

    return optax.GradientTransformation(init_fn, update_fn)


def _strip_head(path: str) -> str:
    """Reference matches against names with the wrapper prefix removed
    (trainer.py:150-153: n.split('.', 1)[-1])."""
    return path.split(".", 1)[-1] if "." in path else path


def assign_param_labels(param_paths: Sequence[str],
                        optim_configs: Sequence[OptimizerConfig],
                        frozen_paths: Sequence[str] = (),
                        split_specs=None) -> Dict[str, str]:
    """{path: 'group_i' | 'frozen'} — first matching group wins; teacher and
    frozen (LoRA-base) params are always 'frozen'.

    ``split_specs`` ({path: (reference_key_template, count)}) lets stacked
    params (MoE experts, per-position MLPs) match the reference's fnmatch
    patterns over their serialised per-index names."""
    frozen = set(frozen_paths)
    split_specs = split_specs or {}
    matchers = []
    for i, oc in enumerate(optim_configs):
        if oc.target_modules is not None:
            matchers.append(PatternMatcher(oc.target_modules))
        else:
            assert len(optim_configs) == 1, \
                "a catch-all optimizer group must be the only group"
            matchers.append(None)
    labels: Dict[str, str] = {}
    for path in param_paths:
        if path.startswith("model_m.") or path in frozen:
            labels[path] = "frozen"
            continue
        if path in split_specs:
            template, count = split_specs[path]
            candidates = [template.format(i=i) for i in range(count)]
        else:
            candidates = [path]
        labels[path] = "frozen"
        for i, m in enumerate(matchers):
            if m is None or any(m.match(_strip_head(c)) for c in candidates):
                labels[path] = f"group_{i}"
                break
    return labels


def build_optimizer(module, params,
                    optim_configs: Sequence[OptimizerConfig],
                    use_snr: bool = False,
                    extra_frozen: Sequence[str] = ()):
    """(optax transform, {path: label}) for the wrapper's parameter tree.

    ``module`` is the ModelTrainerWrapper (or any Module) whose
    ``frozen_param_paths`` encode LoRA/no-grad state; buffers are frozen by
    construction (they appear in the tree but are not ParamSpecs)."""
    flat = flatten(params)
    spec_paths = set(module.param_specs())
    frozen = list(module.frozen_param_paths()) + list(extra_frozen)
    frozen += [p for p in flat if p not in spec_paths]  # buffers
    labels = assign_param_labels(list(flat), optim_configs, frozen,
                                 split_specs=module.split_specs())

    transforms = {"frozen": optax.set_to_zero()}
    for i, oc in enumerate(optim_configs):
        if use_snr:
            transforms[f"group_{i}"] = snr_adam(
                lr=oc.lr, betas=tuple(oc.betas), weight_decay=oc.weight_decay)
        else:
            transforms[f"group_{i}"] = optax.adamw(
                learning_rate=oc.lr, b1=oc.betas[0], b2=oc.betas[1],
                weight_decay=oc.weight_decay)
    label_tree = unflatten({k: v for k, v in labels.items()})
    tx = optax.multi_transform(transforms, label_tree)
    matchers = [PatternMatcher(oc.target_modules) for oc in optim_configs
                if oc.target_modules is not None]
    return tx, labels, matchers
