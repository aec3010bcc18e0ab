"""Benchmark: flagship training-step throughput (VERDICT r2 item 6).

Prints ONE JSON line:
    {"metric": "train_tokens_per_sec", "value": N, "unit": "tokens/s",
     "step_ms": ..., "mfu_hw": ..., "batch_scaling": [...], ...}

Same fenced methodology as ``bench.py`` (which covers the serving path):

* **Fenced timing.** The jitted train step donates and returns the train
  state, so iteration i+1's input IS iteration i's output — the chain
  serializes on-device execution.  The window closes on ``np.asarray`` of
  a param leaf slice + the loss (device→host copies of result bytes), so
  it cannot close before the device finished computing.
  ``block_until_ready`` alone is NOT trusted through the axon tunnel
  (round-1 lesson: it fenced dispatch, not execution).
* **FLOP accounting.** ``compiled.cost_analysis()['flops']`` on the exact
  compiled step gives the FLOPs the hardware actually executes (including
  rematerialized forward passes under gradient checkpointing) — the
  honest numerator for hardware utilization ``mfu_hw``.  An analytic
  3×-forward model-FLOP estimate (``bench.analytic_flops_per_caption``'s
  matmul terms, scaled fwd→fwd+bwd) cross-checks it and yields the
  conventional ``mfu_model`` (remat FLOPs excluded).  Both must be < 1 or
  the script fails loudly rather than print them.
* **Batch scaling table.** Step latency for a 16× batch sweep; once
  compute-bound it must grow with batch (flat scaling ⇒ the fence broke).

The benched step is the real training path built by
``image2text_tpu.training.loop.make_train_step``: flagship
``tpu/nano-mini.yaml`` architecture (12L sparse ViT + 12L MQA/MoE sparse
decoder, gradient checkpointing on), bf16 compute / fp32 master weights,
masked-LM corruption, SNR optimizer — the same program ``trainer.py``
would run per step on this config (reference: training/utils.py:63-110).
"""
from __future__ import annotations

import json
import os
import time

import numpy as np

import jax

from image2text_tpu.utils.compile_cache import setup_compile_cache

setup_compile_cache()
import jax.numpy as jnp

from bench import analytic_flops_per_caption, chip_peak_flops

SEQ_LEN = 256  # the data pipeline's padded caption length (training/data.py)
SMOKE = os.environ.get("BENCH_SMOKE") == "1"
# BENCH_TRAIN_REMAT=dots|none: remat_policy override for the A/B row the
# round-3 verdict asked for (boolean remat OOMs at batch 192;
# jax.checkpoint_dots saves only matmul outputs instead of everything)
REMAT_POLICY = os.environ.get("BENCH_TRAIN_REMAT") or None
# BENCH_TRAIN_ACCUM=k: lax.scan gradient accumulation inside the jitted
# step — recovers effective batches past the activation OOM line (the
# verdict's micro-batch lever); batch points are interpreted as the
# GLOBAL batch (k micro-batches of batch/k rows)
ACCUM = int(os.environ.get("BENCH_TRAIN_ACCUM", "1"))
_B = os.environ.get("BENCH_TRAIN_BATCHES")
BATCHES = ((4, 8) if SMOKE else
           tuple(int(x) for x in _B.split(",")) if _B else
           (16, 48, 96, 128, 192))


def _build():
    from __graft_entry__ import _flagship_config
    from image2text_tpu.training.loop import TrainState, make_train_step
    from image2text_tpu.training.optimizer import build_optimizer
    from image2text_tpu.training.wrapper import (
        ModelTrainerWrapper,
        TokenizerInfo,
    )

    cfg = _flagship_config(tiny=SMOKE)
    cfg.precision = "bf16"
    cfg.use_snr_optim = True
    cfg.trainer.mask_fraction = 0.15
    cfg.trainer.random_mask_fraction = 0.2
    vocab = cfg.model.decoder_config.vocab_size
    tok = TokenizerInfo(eos_token_id=0, bos_token_id=1, mask_token_id=2,
                        vocab_size=vocab)
    wrapper = ModelTrainerWrapper(cfg.model, tok, cfg.trainer,
                                  ignore_index=cfg.ignore_index)
    if REMAT_POLICY == "mixed":
        # dots on the ENCODER only (its saved matmul outputs are the
        # cheap/valuable ones), boolean on the decoder — the round-4
        # verdict's untried mixed per-subtree policy
        from image2text_tpu.training.remat import set_remat_policy

        set_remat_policy(wrapper.model.encoder, "dots")
    elif REMAT_POLICY:
        from image2text_tpu.training.remat import set_remat_policy

        set_remat_policy(wrapper.model,
                         None if REMAT_POLICY == "none" else REMAT_POLICY)
    params = wrapper.init(jax.random.PRNGKey(0))
    tx, _, _ = build_optimizer(wrapper, params, cfg.optimizers,
                               use_snr=cfg.use_snr_optim)
    state = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
    step_fn = jax.jit(
        make_train_step(wrapper, tx, accum_steps=ACCUM,
                        precision=cfg.precision,
                        use_flash=not cfg.disable_flash),
        donate_argnums=(0,))
    # the same step with the XLA attention path, for the end-to-end
    # flash-vs-XLA comparison point (compiled lazily on first call)
    step_nf = jax.jit(
        make_train_step(wrapper, tx, accum_steps=ACCUM,
                        precision=cfg.precision, use_flash=False),
        donate_argnums=(0,))
    return cfg, state, step_fn, step_nf


def _inputs(cfg, batch, seed=0):
    rng = np.random.default_rng(seed)
    size = cfg.model.vision_encoder_config.input.width
    seq = min(SEQ_LEN, cfg.model.decoder_config.block_size)
    images = jnp.asarray(rng.standard_normal((batch, 3, size, size)),
                         jnp.float32)
    labels = np.full((batch, seq), 0, np.int64)  # eos-padded
    lens = rng.integers(8, seq - 1, batch)
    for i, n in enumerate(lens):
        labels[i, :n] = rng.integers(3, cfg.model.decoder_config.vocab_size - 1,
                                     n)
    return images, jnp.asarray(labels), int(np.sum(lens)) + batch


def _fence(state, metrics):
    """D2H-materialize a param leaf slice + the loss: the copies cannot
    complete before the compiled step finished computing them."""
    leaf = jax.tree_util.tree_leaves(state.params)[0]
    a = np.asarray(leaf.reshape(-1)[:8])
    b = np.asarray(metrics["train_loss_lm"])
    assert np.all(np.isfinite(a)) and np.isfinite(b), (a, b)
    return float(b)


def _timed_window(step_fn, state, images, labels, rng, iters):
    t0 = time.perf_counter()
    metrics = None
    for _ in range(iters):
        state, metrics = step_fn(state, images, labels, rng)
    loss = _fence(state, metrics)
    dt = time.perf_counter() - t0
    return dt, state, loss


def main():
    from image2text_tpu.parallel.mesh import honor_platform_env

    honor_platform_env()

    # calibration gate (same policy as bench_kernels.py): the axon tunnel
    # degrades phase-like; wait for a window where a sustained matmul runs
    # at a healthy fraction of peak before measuring, and record the
    # before/after calibration so the artifact is self-auditing
    calib0 = None
    if jax.devices()[0].platform == "tpu":
        from bench_kernels import quick_calib
        deadline = time.time() + float(
            os.environ.get("BENCH_TRAIN_WAIT_MIN", "0")) * 60
        while True:
            calib0 = quick_calib()
            if calib0 > 100 or time.time() > deadline:
                break
            print(f"# calib {calib0:.0f} TFLOP/s — degraded, waiting",
                  flush=True)
            time.sleep(30)

    cfg, state, step_fn, step_nf = _build()
    rng = jax.random.PRNGKey(0)

    scaling = []
    per_batch = {}
    tokens_by_batch = {}
    for batch in BATCHES:
        images, labels, n_real_tokens = _inputs(cfg, batch)
        try:
            state, m = step_fn(state, images, labels, rng)  # warm/compile
            _fence(state, m)
        except Exception as e:
            # a batch that exceeds HBM (flagship batch 192 needs 21 G of
            # the v5e's 15.75 G — the full-vocab logits-backward temp
            # dominates) must not kill the sweep: record it and move on
            print(f"# batch {batch} failed to compile/run: "
                  f"{type(e).__name__}: {str(e)[:200]}", flush=True)
            scaling.append({"batch": batch, "oom": True})
            continue
        iters = 3 if SMOKE else 8
        dts = []
        for _ in range(3):
            dt, state, _ = _timed_window(step_fn, state, images, labels, rng,
                                         iters)
            dts.append(dt)
        lat_ms = sorted(dts)[1] / iters * 1000.0
        scaling.append({"batch": batch, "step_ms": round(lat_ms, 2),
                        "tokens_per_sec":
                            round(batch * labels.shape[1] / (lat_ms / 1e3))})
        per_batch[batch] = lat_ms
        tokens_by_batch[batch] = batch * labels.shape[1]
    assert per_batch, "every batch point failed — nothing to report"

    best = max(per_batch, key=lambda b: tokens_by_batch[b] / per_batch[b])
    images, labels, _ = _inputs(cfg, best)
    iters = 4 if SMOKE else 16
    dts = []
    for _ in range(3):
        dt, state, loss = _timed_window(step_fn, state, images, labels, rng,
                                        iters)
        dts.append(dt)
    step_ms = sorted(dts)[1] / iters * 1000.0
    tok_per_sec = tokens_by_batch[best] / (step_ms / 1e3)

    # ---- flash vs XLA attention at the real model (same batch) -------------
    # the kernels' training-path value measured end-to-end (with in-kernel
    # dropout; the disable_flash path materialises O(s^2) scores fwd+bwd)
    step_ms_noflash = None
    if os.environ.get("BENCH_TRAIN_NOFLASH") == "0":
        step_nf = None  # skip the extra compile (lean A/B sessions)
    try:
        if step_nf is None:
            raise RuntimeError("noflash comparison disabled")
        state, m = step_nf(state, images, labels, rng)  # warm/compile
        _fence(state, m)
        nf = []
        for _ in range(3):
            dt, state, _ = _timed_window(step_nf, state, images, labels,
                                         rng, iters)
            nf.append(dt)
        step_ms_noflash = sorted(nf)[1] / iters * 1000.0
    except Exception as e:
        print(f"# noflash comparison failed: {type(e).__name__}: {e}",
              flush=True)

    # ---- FLOP accounting ---------------------------------------------------
    flops_xla = None
    try:
        ca = step_fn.lower(state, images, labels, rng).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        if ca and "flops" in ca:
            flops_xla = float(ca["flops"])
    except Exception:
        pass
    # model FLOPs: fwd ≈ serving fwd at seq_len tokens (reuse bench.py's
    # analytic matmul accounting via max_new_tokens=seq-1), bwd ≈ 2× fwd
    fwd = analytic_flops_per_caption(cfg, labels.shape[1] - 1, 1)
    flops_model = 3.0 * fwd * best

    dev = jax.devices()[0]
    peak = chip_peak_flops(dev) * max(1, len(jax.devices()))
    steps_per_sec = 1000.0 / step_ms
    mfu_hw = (flops_xla or 0.0) * steps_per_sec / peak
    mfu_model = flops_model * steps_per_sec / peak
    for name, v in (("mfu_hw", mfu_hw), ("mfu_model", mfu_model)):
        assert v < 1.0, (
            f"{name} {v:.2f} >= 1: implied FLOP/s exceeds the chip peak — "
            "the timing fence is broken; do not publish this number")
    lo, hi = min(per_batch), max(per_batch)
    # the fence sanity needs two surviving batch points (a remat-policy
    # sweep can OOM every batch but the smallest — lo == hi is then
    # vacuous, not evidence of a broken fence)
    if not SMOKE and hi > lo and per_batch[hi] < 1.5 * per_batch[lo]:
        raise AssertionError(
            f"batch-{hi} step ({per_batch[hi]:.2f} ms) is not >=1.5x "
            f"batch-{lo} step ({per_batch[lo]:.2f} ms): flat scaling across "
            f"{hi // lo}x compute means the window closed on dispatch")

    calib1 = None
    if jax.devices()[0].platform == "tpu":
        from bench_kernels import quick_calib
        calib1 = quick_calib()

    print(json.dumps({
        "calibration_tflops_before": round(calib0, 1) if calib0 else calib0,
        "calibration_tflops_after": round(calib1, 1) if calib1 else calib1,
        "metric": "train_tokens_per_sec",
        "value": round(tok_per_sec),
        "unit": "tokens/s",
        "step_ms": round(step_ms, 2),
        "step_ms_noflash": (round(step_ms_noflash, 2)
                            if step_ms_noflash else None),
        "flash_speedup": (round(step_ms_noflash / step_ms, 2)
                          if step_ms_noflash else None),
        "steps_per_sec": round(steps_per_sec, 2),
        "remat_policy": REMAT_POLICY or "boolean",
        "accum_steps": ACCUM,
        "batch": best,
        "seq_len": int(labels.shape[1]),
        "final_train_loss_lm": round(loss, 4),
        "flops_per_step_xla": round(flops_xla) if flops_xla else None,
        "flops_per_step_model_3x_analytic": round(flops_model),
        "mfu_hw": round(mfu_hw, 4),
        "mfu_model": round(mfu_model, 4),
        "chip_peak_bf16_flops": peak,
        "batch_scaling": scaling,
        "timing": "median-of-3 fenced windows (donated-state chained, "
                  "D2H-materialized)",
        "device": str(dev.platform),
        "device_kind": getattr(dev, "device_kind", "?"),
        "n_devices": max(1, len(jax.devices())),
        "precision": "bf16 compute / fp32 master",
        "optimizer": "SNRAdam",
        "grad_checkpointing": True,
        "model": "tpu/nano-mini (12L enc + 12L dec, 1024d, MQA/MoE/sparse)",
    }))


if __name__ == "__main__":
    main()
