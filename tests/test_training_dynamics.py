"""Training-DYNAMICS parity vs the mounted torch reference (VERDICT item 2).

Round-1 parity tests pinned single-step numerics; this module proves the
loss engine + optimizer are equivalent *in training dynamics*: both
frameworks start from the SAME weights (torch state_dict transferred
through our checkpoint loader), consume the SAME synthetic batch stream,
and train for N steps — the val-loss trajectories must track.

Two combos:

* **adamw_moco** — AdamW + momentum distillation, mask_fraction=0,
  dropout=0: fully deterministic in both frameworks, so the curves must
  match point-for-point to float-accumulation tolerance;
* **snr_masked** — SNRAdam + MoCo + masked-LM corruption: the corruption
  draws come from different RNGs (torch vs jax), so the curves are
  compared as a tolerance band.

Run directly for the long (200-step) version that writes
``PARITY_TRAINING.json``:

    python tests/test_training_dynamics.py
"""
from __future__ import annotations

import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from test_reference_parity import (  # noqa: E402
    MOE,
    REFERENCE,
    _config_payload,
    _load_reference,
)

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE), reason="reference checkout not mounted")

CASE = dict(attn_type="multi_query", rotator=MOE, causal=True,
            sparse=False, advanced_pos_emb=False)
VOCAB = 512
SEQ = 24
BATCH = 8
N_CLASSES = 8


def make_stream(num_batches: int, batch: int, seed: int,
                task_seed: int = None):
    """Image-conditional synthetic batches (images carry a class pattern,
    labels are the class's token template) shared by both frameworks.

    ``task_seed`` fixes the class→(pattern, template) mapping separately
    from the row draws — a val stream with the train stream's task_seed is
    held-out rows of the SAME task (so its loss can genuinely descend),
    not a different task."""
    rng = np.random.default_rng(seed)
    task_rng = np.random.default_rng(seed if task_seed is None else task_seed)
    patterns = task_rng.standard_normal((N_CLASSES, 3, 64, 64)) \
        .astype(np.float32)
    templates = task_rng.integers(3, VOCAB, (N_CLASSES, SEQ - 4)) \
        .astype(np.int64)
    out = []
    for _ in range(num_batches):
        cls = rng.integers(0, N_CLASSES, batch)
        images = (0.5 * rng.standard_normal((batch, 3, 64, 64))
                  .astype(np.float32) + patterns[cls])
        labels = np.full((batch, SEQ), -100, np.int64)
        for i, c in enumerate(cls):
            n = int(rng.integers(8, SEQ - 4))
            labels[i, :n] = templates[c, :n]
        out.append((images, labels))
    return out


def _trainer_payload(mask_fraction: float, plain_ce: bool = False):
    if plain_ce:
        # plain weighted-CE-only engine: no EMA teacher, no contrastive,
        # no corruption — at toy scale this configuration DESCENDS, so the
        # parity claim is immune to "two broken things can agree"
        return dict(
            moco_momentum=None, moco_alpha=None, training_temperature=1.0,
            weight_fn="constant", mask_fraction=0.0,
            random_mask_fraction=0.0, add_contrastive_loss=False)
    return dict(
        moco_momentum=0.995, moco_alpha=0.4, training_temperature=1.0,
        training_contrastive_temperature=0.5,
        weight_fn="inverse_sqrt_position", eos_token_weight=2.0,
        mask_fraction=mask_fraction, random_mask_fraction=0.2,
        add_contrastive_loss=True)


def run_torch(steps, record_every, stream, val_batch, use_snr, lr,
              mask_fraction, plain_ce=False):
    torch, RefConfig, _ = _load_reference()
    sys.path.insert(0, REFERENCE)
    try:
        from configs.trainer import TrainerWrapperConfig as RefTWC
        from models.optimizer import SNRAdam
        from training.wrapper import ModelTrainerWrapper as RefWrapper
    finally:
        sys.path.remove(REFERENCE)
    import types

    tok = types.SimpleNamespace(eos_token_id=0, bos_token_id=1,
                                mask_token_id=2, vocab_size=VOCAB)
    torch.manual_seed(0)
    wrapper = RefWrapper(
        RefConfig.model_validate(_config_payload(**CASE)), tok,
        RefTWC.model_validate(_trainer_payload(mask_fraction, plain_ce)))
    # .copy(): .numpy() aliases the live tensors, which the optimizer then
    # mutates in place — without it the jax run would start from the
    # POST-training weights
    sd = {k: v.detach().numpy().copy()
          for k, v in wrapper.model.state_dict().items()}

    params = [p for n, p in wrapper.named_parameters()
              if not n.startswith("model_m.")]
    group = {"lr": lr, "weight_decay": 0.01, "betas": (0.9, 0.999),
             "params": params}
    optim = SNRAdam([group]) if use_snr else torch.optim.AdamW([group])

    vi, vl = val_batch
    curve = []
    for step in range(steps):
        if step % record_every == 0:
            wrapper.eval()
            with torch.no_grad():
                vloss, _ = wrapper.val_step(torch.tensor(vi),
                                            torch.tensor(vl))
            curve.append(float(vloss))
        wrapper.train()
        images, labels = stream[step]
        loss, _ = wrapper.train_step(torch.tensor(images),
                                     torch.tensor(labels))
        loss.backward()
        optim.step()
        optim.zero_grad()
    wrapper.eval()
    with torch.no_grad():
        vloss, _ = wrapper.val_step(torch.tensor(vi), torch.tensor(vl))
    curve.append(float(vloss))
    return curve, sd


def run_jax(steps, record_every, stream, val_batch, use_snr, lr,
            mask_fraction, init_sd, plain_ce=False):
    import tempfile

    import jax
    import jax.numpy as jnp

    from image2text_tpu.configs.models import VisionEncoderDecoderConfig
    from image2text_tpu.configs.trainer import (
        OptimizerConfig,
        TrainerWrapperConfig,
    )
    from image2text_tpu.training.loop import TrainState, make_train_step, make_val_step
    from image2text_tpu.training.optimizer import build_optimizer
    from image2text_tpu.training.wrapper import (
        ModelTrainerWrapper,
        TokenizerInfo,
    )
    from image2text_tpu.utils.checkpoint import (
        update_params_from_partial_checkpoint,
    )

    wrapper = ModelTrainerWrapper(
        VisionEncoderDecoderConfig.model_validate(_config_payload(**CASE)),
        TokenizerInfo(eos_token_id=0, bos_token_id=1, mask_token_id=2,
                      vocab_size=VOCAB),
        TrainerWrapperConfig.model_validate(
            _trainer_payload(mask_fraction, plain_ce)))
    params = dict(wrapper.init(jax.random.PRNGKey(0)))
    with tempfile.TemporaryDirectory() as td:
        path = f"{td}/init.npz"
        np.savez(path, **init_sd)
        params["model"] = update_params_from_partial_checkpoint(
            wrapper.model, params["model"], path)
    if wrapper.is_momentum:
        params["model_m"] = wrapper.copy_momentum_params(params)

    tx, _, _ = build_optimizer(
        wrapper, params,
        [OptimizerConfig(lr=lr, weight_decay=0.01, betas=(0.9, 0.999))],
        use_snr=use_snr)
    train_step = jax.jit(make_train_step(wrapper, tx), donate_argnums=(0,))
    val_step = jax.jit(make_val_step(wrapper))
    state = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))

    vi, vl = jnp.asarray(val_batch[0]), jnp.asarray(val_batch[1])
    rng = jax.random.PRNGKey(17)
    curve = []
    for step in range(steps):
        if step % record_every == 0:
            vloss, _ = val_step(state.params, vi, vl)
            curve.append(float(vloss))
        images, labels = stream[step]
        state, _ = train_step(state, jnp.asarray(images),
                              jnp.asarray(labels), rng)
    vloss, _ = val_step(state.params, vi, vl)
    curve.append(float(vloss))
    return curve


def run_pair(steps, record_every, use_snr, mask_fraction, lr=1e-3, seed=0,
             plain_ce=False):
    stream = make_stream(steps, BATCH, seed)
    val_batch = make_stream(1, 32, seed + 1, task_seed=seed)[0]
    t_curve, sd = run_torch(steps, record_every, stream, val_batch, use_snr,
                            lr, mask_fraction, plain_ce)
    j_curve = run_jax(steps, record_every, stream, val_batch, use_snr, lr,
                      mask_fraction, sd, plain_ce)
    return np.asarray(t_curve), np.asarray(j_curve)


def test_adamw_moco_dynamics_match():
    """Deterministic combo: identical weights + identical batches + no
    stochastic ops → the two 30-step val-loss curves must coincide.

    (With moco_alpha=0.4 the ALBEF-style distillation toward the
    still-random EMA teacher dominates early training and the loss RISES
    for the first tens of steps — in BOTH frameworks.  The parity claim is
    the match of the trajectories, plus a sanity check that they actually
    moved.)"""
    t, j = run_pair(steps=30, record_every=6, use_snr=False,
                    mask_fraction=0.0)
    assert abs(t[-1] - t[0]) > 0.02 * t[0], t  # dynamics actually happened
    np.testing.assert_allclose(j, t, rtol=2e-2)


def test_plain_ce_descends_in_lockstep():
    """Descending combo (VERDICT r2 item 7): plain CE, no MoCo/contrastive/
    corruption — both frameworks' val losses must DECREASE and coincide
    (deterministic: identical weights, batches, no stochastic ops)."""
    t, j = run_pair(steps=30, record_every=6, use_snr=False,
                    mask_fraction=0.0, plain_ce=True, lr=3e-3)
    assert t[-1] < t[0] * 0.9, f"torch CE did not descend: {t}"
    assert j[-1] < j[0] * 0.9, f"jax CE did not descend: {j}"
    np.testing.assert_allclose(j, t, rtol=2e-2)


def test_snr_masked_dynamics_band():
    """Stochastic combo (SNRAdam + MoCo + masked-LM corruption): different
    corruption RNGs, so compare as a band: the curves move together and
    stay within 15% of each other at every recorded point."""
    t, j = run_pair(steps=30, record_every=6, use_snr=True,
                    mask_fraction=0.15)
    assert abs(t[-1] - t[0]) > 0.02 * t[0], t
    assert np.sign(j[-1] - j[0]) == np.sign(t[-1] - t[0])
    np.testing.assert_allclose(j, t, rtol=0.15)


if __name__ == "__main__":
    # the long-form run recorded in PARITY.md
    out = {}
    for name, (use_snr, mask, plain) in {
        "adamw_moco_deterministic": (False, 0.0, False),
        "snr_moco_masked": (True, 0.15, False),
        "plain_ce_descending": (False, 0.0, True),
    }.items():
        t, j = run_pair(steps=200, record_every=20, use_snr=use_snr,
                        mask_fraction=mask, plain_ce=plain,
                        lr=3e-3 if plain else 1e-3)
        rel = np.abs(j - t) / np.maximum(np.abs(t), 1e-9)
        out[name] = {
            "steps": 200, "record_every": 20,
            "torch_val_loss": [round(float(x), 5) for x in t],
            "jax_val_loss": [round(float(x), 5) for x in j],
            "max_rel_gap": round(float(rel.max()), 5),
        }
        print(name, "torch:", t, "\njax:", j, "\nmax rel gap:", rel.max())
    with open("PARITY_TRAINING.json", "w") as f:
        json.dump(out, f, indent=1)
