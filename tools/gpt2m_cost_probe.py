"""Static cost check of the gpt2-medium train step (chip-free).

GPT2M_INT4.json's slope-timed 32.1 s/step (int4) / 30.5 s/step (bf16) is
~300x over the analytic FLOP bound (~5 TFLOP/step -> ~50-150 ms on a
healthy v5e), despite a healthy calibration bracket.  Either the compiled
program really does inflated work (rematerialisation gone quadratic, a
pathological scatter, dequant traffic), or the 2-vs-12-step slope windows
were dispatch-polluted (the hi window runs minutes of wall time through
the tunnel, so every sample can be inflated).

This probe compiles the SAME multi-step programs and prints XLA's own
flops / bytes-accessed per step.  If those are sane, the 32 s reading is a
measurement artifact and the bench needs a wider spread or an in-program
step count, not a code fix.

Usage: python tools/gpt2m_cost_probe.py [--bf16-baseline]
"""
from __future__ import annotations

import json
import sys

import numpy as np

sys.path.insert(0, ".")

from image2text_tpu.utils.compile_cache import setup_compile_cache

setup_compile_cache("jaxcache-gpt2m")

import jax
import jax.numpy as jnp
import yaml

LO, HI = 2, 12


def main(load_in_4bit: bool):
    import image2text_tpu.models.hf_decoders.factory as factory

    factory.load_hf_weights = lambda decoder, params: params  # offline

    from image2text_tpu.configs.trainer import TrainingConfig
    from image2text_tpu.training.loop import TrainState, make_train_step
    from image2text_tpu.training.optimizer import build_optimizer
    from image2text_tpu.training.wrapper import (ModelTrainerWrapper,
                                                 TokenizerInfo)

    with open("training_configs/tpu/gpt2-medium.yaml") as f:
        cfg = TrainingConfig.model_validate(yaml.safe_load(f))
    cfg.model.decoder_config.load_in_4bit = load_in_4bit
    cfg.gradient_accumulation_steps = 1

    tok = TokenizerInfo(eos_token_id=50256, bos_token_id=50256,
                        mask_token_id=None, vocab_size=50257)
    wrapper = ModelTrainerWrapper(cfg.model, tok, cfg.trainer,
                                  ignore_index=cfg.ignore_index)
    params = wrapper.init(jax.random.PRNGKey(0))
    tx, _, _ = build_optimizer(wrapper, params, cfg.optimizers,
                               use_snr=cfg.use_snr_optim)
    step_body = make_train_step(wrapper, tx, 1, cfg.precision)
    state = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))

    rng = np.random.default_rng(0)
    b = cfg.batch_size
    images = jnp.asarray(rng.standard_normal((b, 3, 128, 128)), jnp.float32)
    labels = np.full((b, 48), -100, np.int64)
    for i, n in enumerate(rng.integers(8, 40, b)):
        labels[i, :n] = rng.integers(3, 50000, n)
    labels = jnp.asarray(labels)

    def multi_step(n):
        def run(state, images, labels, rng):
            def body(i, s):
                s, _ = step_body(s, images, labels,
                                 jax.random.fold_in(rng, i))
                return s
            return jax.lax.fori_loop(0, n, body, state)

        return jax.jit(run, donate_argnums=(0,))

    costs = {}
    for n in (LO, HI):
        compiled = multi_step(n).lower(
            state, images, labels, jax.random.PRNGKey(0)).compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        costs[n] = ca
        print(f"n={n}: flops={ca.get('flops', 0)/1e12:.3f} TFLOP, "
              f"bytes={ca.get('bytes accessed', 0)/1e9:.3f} GB", flush=True)
    # Finding: XLA's cost model counts a fori_loop BODY once regardless of
    # trip count (n=2 and n=12 report identical totals), so the slope is
    # zero and the per-program absolutes ARE the per-step cost (the loop
    # body dominates; setup ops are shared noise).
    flops = costs[HI].get("flops", 0)
    byac = costs[HI].get("bytes accessed", 0)
    out = {
        "variant": "int4+lora" if load_in_4bit else "bf16-frozen+lora",
        "batch": b,
        "flops_per_step_tflop": round(flops / 1e12, 3),
        "bytes_accessed_per_step_gb": round(byac / 1e9, 3),
        "mxu_floor_ms_at_197tflops": round(flops / 197e9, 1),
        "hbm_floor_ms_at_819gbs": round(byac / 819e6, 1),
        "slope_step_ms_recorded": 32059.2 if load_in_4bit else 30453.3,
        "note": "cost model counts the while body once (n=2 == n=12); "
                "absolutes above are per-step.  The recorded 32.1/30.5 s "
                "slope readings are ~400x above this bound and inflate "
                "both variants identically — consistent with pooled-chip "
                "time-slicing of minutes-long dispatches, not program "
                "cost; treat the int4-vs-bf16 RATIO (1.05x) as the "
                "meaningful number.",
    }
    print(json.dumps(out))
    with open("GPT2M_COST.jsonl", "a") as f:
        f.write(json.dumps(out) + "\n")


if __name__ == "__main__":
    main(load_in_4bit="--bf16-baseline" not in sys.argv)
