"""On-chip gpt2-medium int4+LoRA training footprint (VERDICT item 7).

Runs `training_configs/tpu/gpt2-medium.yaml` (24-layer GPT-2-medium
decoder, int4-quantized frozen base + LoRA adapters + cross-attention,
sparse scratch ViT encoder) for a few real train steps on the TPU with
RANDOM-INIT weights (no network: the HF checkpoint fetch is stubbed out —
weight VALUES don't affect footprint or step time), and reports:

* parameter-tree HBM bytes, split frozen-int4 vs float, and the bf16
  bytes the quantized leaves would otherwise occupy;
* device memory in use after init and after one step (memory_stats);
* per-step wall time (fenced) at the YAML's batch size.

Run:  python tools/bench_gpt2_medium_int4.py [--bf16-baseline]
Appends one JSON line per variant to GPT2M_INT4.json for PARITY.md.
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import yaml

sys.path.insert(0, ".")


def _hbm_live_bytes(dev):
    """HBM in use: memory_stats when the plugin exposes it, else summed
    live buffers from device_memory_profile (pprof protobuf — parse the
    total lazily, fall back to None)."""
    stats = dev.memory_stats() or {}
    if stats.get("bytes_in_use") is not None:
        return int(stats["bytes_in_use"])
    try:
        # total of live buffer sizes on this device — no pprof parsing
        return int(sum(a.nbytes for a in jax.live_arrays()
                       if dev in a.devices()))
    except Exception:
        return None


def main(load_in_4bit: bool):
    import image2text_tpu.models.hf_decoders.factory as factory

    factory.load_hf_weights = lambda decoder, params: params  # offline

    from image2text_tpu.configs.trainer import TrainingConfig
    from image2text_tpu.training.loop import (
        TrainState,
        make_train_step,
    )
    from image2text_tpu.training.optimizer import build_optimizer
    from image2text_tpu.training.wrapper import (
        ModelTrainerWrapper,
        TokenizerInfo,
    )
    from image2text_tpu.utils.tree import flatten

    with open("training_configs/tpu/gpt2-medium.yaml") as f:
        cfg = TrainingConfig.model_validate(yaml.safe_load(f))
    cfg.model.decoder_config.load_in_4bit = load_in_4bit
    cfg.gradient_accumulation_steps = 1

    tok = TokenizerInfo(eos_token_id=50256, bos_token_id=50256,
                        mask_token_id=None, vocab_size=50257)
    wrapper = ModelTrainerWrapper(cfg.model, tok, cfg.trainer,
                                  ignore_index=cfg.ignore_index)
    params = wrapper.init(jax.random.PRNGKey(0))

    flat = flatten(params)
    int_bytes = sum(int(np.prod(v.shape)) * v.dtype.itemsize
                    for v in flat.values()
                    if not jnp.issubdtype(v.dtype, jnp.floating))
    float_bytes = sum(int(np.prod(v.shape)) * v.dtype.itemsize
                      for v in flat.values()
                      if jnp.issubdtype(v.dtype, jnp.floating))
    # what the packed-uint8 leaves would cost in bf16 (2 values/byte -> 4x)
    bf16_equiv = sum(int(np.prod(v.shape)) * 4 for v in flat.values()
                     if v.dtype == jnp.uint8)

    dev = jax.devices()[0]
    params = jax.device_put(params, dev)
    tx, _, _ = build_optimizer(wrapper, params, cfg.optimizers,
                               use_snr=cfg.use_snr_optim)
    step_body = make_train_step(wrapper, tx, 1, cfg.precision)
    step = jax.jit(step_body, donate_argnums=(0,))
    state = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))

    def multi_step(n):
        """n chained train steps in ONE dispatch (lax.fori_loop): the
        axon tunnel's per-dispatch latency for this large-argument
        program reaches tens of seconds even in calibration-healthy
        windows (round-2/3 recorded 90s/32s 'step' times bounded by the
        FLOP count at well under 1s), so per-step time must come from
        the SLOPE between two on-device iteration counts — dispatch cost
        cancels exactly (same methodology as tools/decode_slope.py)."""
        def run(state, images, labels, rng):
            def body(i, s):
                s, _ = step_body(s, images, labels,
                                 jax.random.fold_in(rng, i))
                return s
            return jax.lax.fori_loop(0, n, body, state)

        return jax.jit(run, donate_argnums=(0,))
    stats_init = dict(dev.memory_stats() or {})

    rng = np.random.default_rng(0)
    b = cfg.batch_size
    images = jax.device_put(jnp.asarray(
        rng.standard_normal((b, 3, 128, 128)), jnp.float32), dev)
    labels = np.full((b, 48), -100, np.int64)
    for i, n in enumerate(rng.integers(8, 40, b)):
        labels[i, :n] = rng.integers(3, 50000, n)
    labels = jax.device_put(jnp.asarray(labels), dev)

    state, metrics = step(state, images, labels, jax.random.PRNGKey(0))
    jax.block_until_ready(metrics)
    stats_step = dict(dev.memory_stats() or {})
    hbm_live = _hbm_live_bytes(dev)

    # calibration gate (VERDICT r2 #6): the round-2 step_ms numbers were
    # captured in a degraded-tunnel phase (25ms-to-seconds dispatch); keep
    # re-timing until a window overlaps a healthy phase or attempts end,
    # and record the best window + the calibration context
    from bench_kernels import calibration_tflops

    import os

    LO, HI = 2, 12
    run_lo, run_hi = multi_step(LO), multi_step(HI)

    def fenced_s(run, st):
        t0 = time.perf_counter()
        st = run(st, images, labels, jax.random.PRNGKey(0))
        np.asarray(jax.tree_util.tree_leaves(st.params)[0].reshape(-1)[:4])
        return time.perf_counter() - t0, st

    # warm both compiled programs (off the clock)
    _, state = fenced_s(run_lo, state)
    _, state = fenced_s(run_hi, state)

    best_dt = float("inf")
    calib = 0.0
    deadline = time.time() + float(
        os.environ.get("GPT2M_WAIT_MIN", "2")) * 60
    attempt = 0
    while True:
        attempt += 1
        c = calibration_tflops()
        los, his = [], []
        for _ in range(3):
            t, state = fenced_s(run_lo, state)
            los.append(t)
            t, state = fenced_s(run_hi, state)
            his.append(t)
        # min converges to true device time separately per window
        # (degradation/dispatch only inflate samples)
        dt = (min(his) - min(los)) / (HI - LO)
        if 0 < dt < best_dt and c > 100:
            best_dt, calib = dt, c
        print(f"attempt {attempt}: calibration {c:.1f} TFLOP/s, "
              f"slope step {dt * 1e3:.1f} ms", flush=True)
        if (best_dt < float('inf') and c > 100) or time.time() > deadline:
            break
        time.sleep(20)
    dt = best_dt if best_dt < float("inf") else float("nan")
    state, metrics = step(state, images, labels, jax.random.PRNGKey(7))

    from image2text_tpu.ops.int4_matmul import INT4_KERNEL

    out = {
        "variant": "int4+lora" if load_in_4bit else "bf16-frozen+lora",
        "config": "training_configs/tpu/gpt2-medium.yaml (random init)",
        "batch": b,
        "step_ms": round(dt * 1000, 1),
        "calibration_tflops": round(calib, 1),
        "decision_grade": calib > 100,
        "int4_forward_kernel": INT4_KERNEL if load_in_4bit else None,
        "loss": round(float(metrics["train_loss_lm"]), 4),
        "param_bytes_int": int_bytes,
        "param_bytes_float": float_bytes,
        "quantized_leaves_bf16_equivalent_bytes": bf16_equiv,
        "hbm_bytes_in_use_after_init": stats_init.get("bytes_in_use"),
        "hbm_bytes_in_use_after_step": stats_step.get("bytes_in_use"),
        "hbm_live_buffer_bytes": hbm_live,
        "hbm_peak_bytes": stats_step.get("peak_bytes_in_use"),
        "device_kind": getattr(dev, "device_kind", "?"),
    }
    print(json.dumps(out))
    with open("GPT2M_INT4.json", "a") as f:
        f.write(json.dumps(out) + "\n")


if __name__ == "__main__":
    main(load_in_4bit="--bf16-baseline" not in sys.argv)
