"""Training runtime: jitted train/val steps over a device mesh + host loops.

The reference's accelerate machinery (autocast, accumulate, DDP backward,
gather — training/utils.py:63-164) becomes ONE compiled program per step:

* data parallelism — inputs arrive with ``P('data')`` sharding, params
  replicated; XLA inserts the gradient psums over ICI (no explicit
  collectives);
* mixed precision — params are cast to the compute dtype *inside* the step
  (fp32 master weights, bf16 compute; no loss scaling needed on TPU);
* gradient accumulation — a ``lax.scan`` over micro-batches inside the
  step (mean of micro-gradients, matching accelerate's loss scaling);
* EMA momentum teacher — updated in the same compiled step
  (reference wrapper.py:212);
* val metrics — scalar reductions over the global batch; the cross-process
  ``accelerator.gather`` (:156-157) is implicit in the sharded reduction.
"""
from __future__ import annotations

import time
from typing import Any, Callable, Dict, List, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from image2text_tpu.configs.trainer import TrainingConfig
from image2text_tpu.parallel.mesh import (
    data_sharding,
    make_mesh,
    replicated,
    shard_batch,
)
from image2text_tpu.training.optimizer import build_optimizer
from image2text_tpu.training.wrapper import ModelTrainerWrapper
from image2text_tpu.utils.patterns import PatternMatcher


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jax.Array


def _cast_for_compute(params, dtype):
    if dtype == jnp.float32:
        return params
    return jax.tree_util.tree_map(
        lambda x: x.astype(dtype) if jnp.issubdtype(x.dtype, jnp.floating) else x,
        params)


def compute_dtype(precision: str):
    """'no' → fp32; 'bf16'/'fp16' → bf16 (fp16 has no TPU advantage and
    would need loss scaling; bf16 is the TPU-native reduced precision)."""
    return jnp.float32 if precision == "no" else jnp.bfloat16


def _value_and_grad_float(loss_fn):
    """value_and_grad over only the floating leaves (int4-quantized frozen
    weights are constants; grads for them come back as zeros)."""
    from image2text_tpu.utils.tree import flatten, unflatten

    def wrapped(params, *args):
        flat = flatten(params)
        fvals = {k: v for k, v in flat.items()
                 if jnp.issubdtype(v.dtype, jnp.floating)}
        rest = {k: v for k, v in flat.items() if k not in fvals}

        def inner(fv):
            return loss_fn(unflatten({**rest, **fv}), *args)

        (loss, aux), g = jax.value_and_grad(inner, has_aux=True)(fvals)
        gflat = {k: jnp.zeros_like(v) for k, v in rest.items()}
        gflat.update(g)
        return (loss, aux), unflatten(gflat)

    return wrapped


def make_train_step(wrapper: ModelTrainerWrapper, tx,
                    accum_steps: int = 1, precision: str = "no",
                    use_flash: bool = True, opt_shardings=None) -> Callable:
    dtype = compute_dtype(precision)

    def loss_fn(params, images, labels, rng):
        cparams = _cast_for_compute(params, dtype)
        loss, metrics = wrapper.train_step(
            cparams, images.astype(dtype), labels, rng, use_flash=use_flash)
        return loss, metrics

    grad_fn = _value_and_grad_float(loss_fn)

    def step_fn(state: TrainState, images, labels, rng):
        # Python side effect: runs once per (re)trace, never per step.
        # Regression hook for the step-2-retrace bugs (denormal specs /
        # GSPMD round-trip) — tests assert traces stays at 1 across steps.
        step_fn.traces += 1
        rng = jax.random.fold_in(rng, state.step)
        if accum_steps > 1:
            b = images.shape[0]
            assert b % accum_steps == 0, (
                f"batch_size {b} must be divisible by "
                f"gradient_accumulation_steps {accum_steps} "
                "(silently dropping samples would skew the loss)")
            micro = b // accum_steps
            im = images[:micro * accum_steps].reshape(accum_steps, micro,
                                                      *images.shape[1:])
            lb = labels[:micro * accum_steps].reshape(accum_steps, micro,
                                                      *labels.shape[1:])

            def scan_body(carry, xs):
                g_acc, m_acc = carry
                im_i, lb_i, i = xs
                (loss, metrics), grads = grad_fn(
                    state.params, im_i, lb_i, jax.random.fold_in(rng, i))
                g_acc = jax.tree_util.tree_map(jnp.add, g_acc, grads)
                m_acc = jax.tree_util.tree_map(jnp.add, m_acc, metrics)
                return (g_acc, m_acc), None

            zeros_g = jax.tree_util.tree_map(
                lambda x: jnp.zeros(x.shape, jnp.float32), state.params)
            m_shape = jax.eval_shape(
                lambda p, i, l, r: grad_fn(p, i, l, r)[0][1],
                state.params, im[0], lb[0], rng)
            zeros_m = jax.tree_util.tree_map(
                lambda s: jnp.zeros(s.shape, s.dtype), m_shape)
            (g_sum, m_sum), _ = jax.lax.scan(
                scan_body, (zeros_g, zeros_m),
                (im, lb, jnp.arange(accum_steps)))
            grads = jax.tree_util.tree_map(lambda g: g / accum_steps, g_sum)
            metrics = jax.tree_util.tree_map(lambda m: m / accum_steps, m_sum)
        else:
            (loss, metrics), grads = grad_fn(state.params, images, labels, rng)

        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        if opt_shardings is not None:
            # ZeRO-1: pin the new moments to their P('data') shards so the
            # compiler keeps update math distributed across steps
            opt_state = jax.lax.with_sharding_constraint(opt_state,
                                                         opt_shardings)
        params = optax.apply_updates(state.params, updates)
        if wrapper.is_momentum:
            params = dict(params)
            params["model_m"] = wrapper.momentum_update(params)
        return TrainState(params, opt_state, state.step + 1), metrics

    step_fn.traces = 0
    return step_fn


def make_val_step(wrapper: ModelTrainerWrapper, precision: str = "no",
                  use_flash: bool = True) -> Callable:
    dtype = compute_dtype(precision)

    def val_fn(params, images, labels):
        cparams = _cast_for_compute(params, dtype)
        loss, metrics = wrapper.val_step(cparams, images.astype(dtype), labels,
                                         use_flash=use_flash)
        return loss, metrics

    return val_fn


class Trainer:
    """Host-side orchestration: mesh, jitted steps, epoch loops, checkpoint
    save, qualitative eval (reference train_loop/val_loop/eval_model)."""

    def __init__(self, config: TrainingConfig, wrapper: ModelTrainerWrapper,
                 params, mesh=None, logging_callback=None):
        self.config = config
        self.wrapper = wrapper
        self.mesh = mesh if mesh is not None else make_mesh(config.mesh)
        self.logging_callback = logging_callback
        self.tx, self.labels, self.matchers = build_optimizer(
            wrapper, params, config.optimizers, use_snr=config.use_snr_optim)
        rep = replicated(self.mesh)
        if self.mesh.shape.get("model", 1) > 1:
            # tensor parallelism: Megatron-style column/row weight shardings
            # over the 'model' axis; optimizer moments inherit the
            # placements through zeros_like in tx.init
            from image2text_tpu.parallel.sharding_rules import place_params

            params = place_params(params, self.mesh)
        else:
            params = jax.device_put(params, rep)
        if config.sequence_parallel:
            from image2text_tpu.parallel.sharding_rules import (
                set_sequence_parallel,
            )

            n = set_sequence_parallel(wrapper.model, self.mesh)
            if n == 0 and jax.process_index() == 0:
                print("WARNING: sequence_parallel requested but no blocks "
                      "tagged (mesh.model == 1 or unrecognised decoder)",
                      flush=True)
        if config.remat_policy is not None:
            from image2text_tpu.training.remat import set_remat_policy

            set_remat_policy(wrapper.model, config.remat_policy)
        opt_state = self.tx.init(params)
        # fresh scalars from tx.init (e.g. SNR's `iter` counter) land on the
        # default device, not the mesh — replicate them so the whole state
        # lives on one device set (a mixed-device state both breaks the
        # out_shardings pin below and desyncs multi-host meshes)
        from jax.sharding import NamedSharding

        opt_state = jax.tree_util.tree_map(
            lambda x: x if isinstance(getattr(x, "sharding", None),
                                      NamedSharding)
            else jax.device_put(x, rep), opt_state)
        opt_shardings = None
        if (config.zero_sharded_optimizer
                and self.mesh.shape.get("data", 1) > 1):
            # ZeRO-1 (beyond the reference): Adam/SNR moments sharded over
            # the data axis; XLA all-gathers the per-shard updates over ICI
            from image2text_tpu.parallel.sharding_rules import (
                zero_opt_state_shardings,
            )

            opt_shardings = zero_opt_state_shardings(opt_state, self.mesh)
            opt_state = jax.tree_util.tree_map(jax.device_put, opt_state,
                                               opt_shardings)
        self.state = TrainState(params, opt_state,
                                jax.device_put(jnp.zeros((), jnp.int32), rep))
        use_flash = not config.disable_flash
        # shardings are carried by the (committed) inputs: params tp-or-
        # replicated, batches P('data') via shard_batch
        # Pin output state shardings to the INPUT state's: without this,
        # GSPMD may emit an output spec that is equivalent but not equal to
        # the input's (normal-form P('model') vs P('model', None), or a
        # propagated sharding for a rule-less param), and the second step —
        # whose input is the first step's output — silently retraces and
        # recompiles the whole train program (~80s on a CPU host, a full
        # flagship compile on TPU).  Metrics stay unconstrained.
        state_shardings = jax.tree_util.tree_map(lambda a: a.sharding,
                                                 self.state)
        self._train_step = jax.jit(
            make_train_step(wrapper, self.tx,
                            config.gradient_accumulation_steps,
                            config.precision, use_flash,
                            opt_shardings=opt_shardings),
            donate_argnums=(0,),
            out_shardings=(state_shardings, None))
        self._val_step = jax.jit(
            make_val_step(wrapper, config.precision, use_flash))
        self.rng = jax.random.PRNGKey(config.seed)

    # -- loops (reference training/utils.py:63-164) -------------------------
    def train_loop(self, train_iter, epoch: int,
                   chkpt_fname: Optional[str] = None,
                   log_every: int = 20) -> bool:
        from image2text_tpu.utils.profiling import Throughput, TraceWindow

        cfg = self.config
        num_steps = 100 if cfg.num_steps is None else cfg.num_steps
        stop = False
        meter = Throughput()
        trace = TraceWindow(cfg.profile_dir if epoch == 0 else None)
        metrics_np = {}
        for step in range(num_steps):
            trace.step(step)
            try:
                images, labels = next(train_iter)
            except StopIteration:
                stop = True
                break
            n_tokens = int(np.prod(labels.shape))
            images, labels = shard_batch(self.mesh, jnp.asarray(images),
                                         jnp.asarray(labels))
            self.state, metrics = self._train_step(self.state, images, labels,
                                                   self.rng)
            meter.update(items=n_tokens)
            if (step + 1) % log_every == 0 or step == num_steps - 1:
                metrics_np = {k: float(v) for k, v in metrics.items()}
                if jax.process_index() == 0:
                    print(f"epoch {epoch} step {step + 1}/{num_steps} "
                          f"{metrics_np} ({meter.steps_per_sec:.2f} steps/s, "
                          f"{meter.items_per_sec:.0f} tok/s)", flush=True)
                if self.logging_callback is not None:
                    self.logging_callback(metrics_np, batch=step, epoch=epoch)
        trace.close()

        if (cfg.reset_moco_after_k_epochs is not None
                and (epoch + 1) in cfg.reset_moco_after_k_epochs
                and self.wrapper.is_momentum):
            params = dict(self.state.params)
            params["model_m"] = self.wrapper.copy_momentum_params(params)
            self.state = self.state._replace(params=params)

        if chkpt_fname is not None:
            from image2text_tpu.utils.checkpoint import save_checkpoint

            # EVERY process calls: export_state_dict's gather is a
            # cross-process collective for multi-host-mesh params; only
            # process 0 writes the file (gate lives inside save_checkpoint)
            save_checkpoint(self.wrapper.model, self.state.params["model"],
                            chkpt_fname, matchers=self.matchers or None)
        return stop

    # -- full-state resume (beyond reference parity; SURVEY §5.4) -----------
    def save_state(self, path: str) -> None:
        from image2text_tpu.training.checkpoint import save_train_state

        save_train_state(path, self.state)

    def restore_state(self, path: str) -> None:
        from image2text_tpu.training.checkpoint import restore_train_state

        self.state = restore_train_state(path, self.state)

    def val_loop(self, val_iter, epoch: int):
        cfg = self.config
        num_steps = 100 if cfg.num_val_steps is None else cfg.num_val_steps
        loss_all: List[float] = []
        metrics_all: Dict[str, float] = {}
        # keep every step's outputs on device and pull ONCE at the end:
        # a float() per step is a host sync that serialises the val loop
        # against dispatch (harmless at 100 steps, sloppy at scale)
        losses = []
        metrics_dev: Dict[str, list] = {}
        for _ in range(num_steps):
            images, labels = next(val_iter)
            images, labels = shard_batch(self.mesh, jnp.asarray(images),
                                         jnp.asarray(labels))
            loss, metrics = self._val_step(self.state.params, images, labels)
            losses.append(loss)
            for k, v in metrics.items():
                metrics_dev.setdefault(k, []).append(v)
        loss_all = [float(x) for x in jax.device_get(losses)]
        for k, vs in metrics_dev.items():
            metrics_all[k] = float(np.mean(jax.device_get(vs)))
        return float(np.mean(loss_all)), metrics_all
