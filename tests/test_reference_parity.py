"""Full-model numerical parity against the actual PyTorch reference.

Builds the reference ``VisionEncoderDecoder`` (mounted read-only at
/root/reference) and ours from the SAME config payload, transfers the
torch ``state_dict`` through our checkpoint loader (the key naming is
designed to match — utils/checkpoint.py), and compares encoder outputs
and logits.  This pins the entire layer stack — patch extractor, MQA/MHA,
MoE dispatch, cross-attention, soft-prompt masking, sparse attention
permutations, positional MLPs, weight tying — to the reference numerics
in one assertion.

Skipped when the reference checkout or torch is unavailable.
"""
import importlib.machinery
import os
import sys
import types

import numpy as np
import pytest

REFERENCE = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE), reason="reference checkout not mounted")


def _load_reference():
    """Import the reference model package with stubs for its unused deps
    (smart_open, torchvision — the from-scratch encoder path needs neither)."""
    torch = pytest.importorskip("torch")
    sys.modules.setdefault(
        "smart_open", types.SimpleNamespace(open=open))
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tvm = types.ModuleType("torchvision.models")
        tv.__spec__ = importlib.machinery.ModuleSpec("torchvision", None)
        tvm.__spec__ = importlib.machinery.ModuleSpec(
            "torchvision.models", None)

        def _unavailable(*a, **k):
            raise RuntimeError("torchvision stub: pretrained ViT unavailable")

        tvm.vit_b_16 = _unavailable
        tvm.ViT_B_16_Weights = types.SimpleNamespace(
            IMAGENET1K_SWAG_LINEAR_V1=None)
        tv.models = tvm
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.models"] = tvm
    sys.path.insert(0, REFERENCE)
    try:
        from configs.models import VisionEncoderDecoderConfig as RefConfig
        from models.vision_encoder_decoder import (
            VisionEncoderDecoder as RefModel,
        )
    finally:
        sys.path.remove(REFERENCE)
    return torch, RefConfig, RefModel


def _config_payload(*, attn_type: str, rotator: dict, causal: bool,
                    sparse: bool, advanced_pos_emb: bool,
                    block_size: int = 96) -> dict:
    """One payload validated by BOTH pydantic schemas (schema parity)."""
    def transformer(is_cross_attn):
        cfg = dict(
            rotator_config=dict(rotator),
            attn_config=dict(attn_type=attn_type, n_embd=64, n_head=4,
                             dropout=0.0),
            is_causal=causal,
            is_cross_attn=is_cross_attn,
        )
        if sparse and is_cross_attn:  # decoder side only
            cfg.update(is_sparse_attn=True, sparsity_factor=0.5,
                       max_block_size=block_size)
        return cfg

    return dict(
        vision_encoder_config=dict(
            transformer_config=transformer(False),
            enable_gradient_checkpointing=False,
            input=dict(n_channels=3, width=64, height=64),
            n_layer=2, n_cls=8, num_patches=16, n_channels=16,
            feature_extractor_gate_sizes=(8,),
            feature_extractor_kernel_size=(4, 4)),
        decoder_config=dict(
            transformer_config=transformer(True),
            n_layer=2, block_size=block_size, vocab_size=512,
            use_advanced_pos_emb=advanced_pos_emb,
            advanced_pos_emb_gate_sizes=(16,) if advanced_pos_emb else None),
        use_cross_attn=True, use_soft_prompting=True,
    )


MOE = dict(num_experts=4, proj_features=8, gate_sizes=None,
           ff_mult_factor=2.5, top_k=2)
MLP = dict(ff_mult=4)

CASES = {
    "mqa_moe_dense": dict(attn_type="multi_query", rotator=MOE, causal=False,
                          sparse=False, advanced_pos_emb=False),
    "mha_mlp_sparse_advpos": dict(attn_type="multi_head", rotator=MLP,
                                  causal=True, sparse=True,
                                  advanced_pos_emb=True),
}
CAUSAL_CASE = dict(attn_type="multi_query", rotator=MOE, causal=True,
                   sparse=False, advanced_pos_emb=False)


def _paired_models(tmp_path, **case):
    """(torch, reference model, our model, our params-with-ref-weights)."""
    torch, RefConfig, RefModel = _load_reference()
    import jax

    from image2text_tpu.configs.models import VisionEncoderDecoderConfig
    from image2text_tpu.models.vision_encoder_decoder import (
        VisionEncoderDecoder,
    )
    from image2text_tpu.utils.checkpoint import (
        update_params_from_partial_checkpoint,
    )

    payload = _config_payload(**case)
    torch.manual_seed(0)
    ref = RefModel(RefConfig.model_validate(payload)).eval()
    path = str(tmp_path / "ref.npz")
    np.savez(path, **{k: v.detach().numpy()
                      for k, v in ref.state_dict().items()})
    model = VisionEncoderDecoder(
        VisionEncoderDecoderConfig.model_validate(payload))
    params = update_params_from_partial_checkpoint(
        model, model.init(jax.random.PRNGKey(0)), path)
    return torch, ref, model, params


@pytest.mark.parametrize("case", sorted(CASES))
def test_full_model_logits_parity(case, tmp_path):
    torch, RefConfig, RefModel = _load_reference()
    import jax.numpy as jnp

    from image2text_tpu.configs.models import VisionEncoderDecoderConfig
    from image2text_tpu.models.vision_encoder_decoder import (
        VisionEncoderDecoder,
    )
    from image2text_tpu.utils.checkpoint import (
        export_state_dict,
        update_params_from_partial_checkpoint,
    )

    payload = _config_payload(**CASES[case])
    torch.manual_seed(0)
    ref = RefModel(RefConfig.model_validate(payload)).eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    model = VisionEncoderDecoder(
        VisionEncoderDecoderConfig.model_validate(payload))
    import jax
    params = model.init(jax.random.PRNGKey(0))

    # state_dict naming parity is itself part of the contract
    ours = set(export_state_dict(model, params))
    theirs = set(sd)
    assert theirs == ours, (
        f"state_dict key mismatch: only-reference={sorted(theirs - ours)[:8]} "
        f"only-ours={sorted(ours - theirs)[:8]}")

    path = str(tmp_path / "ref.npz")
    np.savez(path, **sd)
    params = update_params_from_partial_checkpoint(model, params, path)

    rng = np.random.default_rng(0)
    images = rng.standard_normal((4, 3, 64, 64)).astype(np.float32)
    ids = rng.integers(0, 512, (4, 48))

    with torch.no_grad():
        out_t = ref(images=torch.tensor(images), ids=torch.tensor(ids))
    out_j = model(params, jnp.asarray(images), jnp.asarray(ids))

    np.testing.assert_allclose(
        np.asarray(out_j.encoder_output), out_t.encoder_output.numpy(),
        rtol=2e-3, atol=2e-4, err_msg=f"{case}: encoder output diverges")
    np.testing.assert_allclose(
        np.asarray(out_j.logits), out_t.logits.numpy(),
        rtol=2e-3, atol=2e-3, err_msg=f"{case}: logits diverge")


def test_generate_greedy_parity(tmp_path):
    """Greedy decode (top_k=1 → deterministic multinomial in both) must
    produce the reference's exact token sequence — our KV-cached
    ``lax.fori_loop`` vs its O(T²) full-re-forward Python loop, including
    the temperature → no-repeat-ngram → top-k → nucleus-softmax pipeline."""
    torch, ref, model, params = _paired_models(tmp_path, **CAUSAL_CASE)
    import jax.numpy as jnp

    rng = np.random.default_rng(1)
    images = rng.standard_normal((2, 3, 64, 64)).astype(np.float32)
    prompt = rng.integers(3, 512, (2, 6))

    with torch.no_grad():
        ref_ids = ref.generate(torch.tensor(images), torch.tensor(prompt),
                               max_new_tokens=12, temperature=1.0, top_k=1)
    ours = model.generate(params, jnp.asarray(images), jnp.asarray(prompt),
                          max_new_tokens=12, temperature=1.0, top_k=1)
    np.testing.assert_array_equal(np.asarray(ours), ref_ids.numpy())


def test_generate_noncausal_parity(tmp_path):
    """The reference's own unit test generates with a bidirectional decoder
    (vision_encoder_decoder_test.py:90-92) — every position's logits see
    the whole sequence, so fixed-buffer decoding can't serve it; our
    growing-sequence host path must match the reference token-for-token."""
    torch, ref, model, params = _paired_models(tmp_path,
                                               **CASES["mqa_moe_dense"])
    import jax.numpy as jnp

    rng = np.random.default_rng(4)
    images = rng.standard_normal((2, 3, 64, 64)).astype(np.float32)
    prompt = rng.integers(3, 512, (2, 4))

    with torch.no_grad():
        ref_ids = ref.generate(torch.tensor(images), torch.tensor(prompt),
                               max_new_tokens=5, temperature=1.0, top_k=1)
    ours = model.generate(params, jnp.asarray(images), jnp.asarray(prompt),
                          max_new_tokens=5, temperature=1.0, top_k=1)
    np.testing.assert_array_equal(np.asarray(ours), ref_ids.numpy())


def test_beam_search_deterministic_parity(tmp_path):
    """temperature<=0 (top-k expansion) + consolidation_temperature<=0
    (top-k consolidation) make stochastic beam search fully deterministic:
    our take_along_axis choreography must reproduce the reference's
    gather/permute machinery token-for-token and score-for-score."""
    torch, ref, model, params = _paired_models(tmp_path, **CAUSAL_CASE)
    import jax.numpy as jnp

    sys.path.insert(0, REFERENCE)
    try:
        from models.generation_utils import (
            BeamSearchTokenGenerator as RefBeam,
        )
    finally:
        sys.path.remove(REFERENCE)
    from image2text_tpu.models.generation_utils import (
        BeamSearchTokenGenerator,
    )

    kw = dict(beam_width=2, temperature=-1.0, top_k=None, max_new_tokens=10,
              beam_expansion_factor=2, eos_token_id=0,
              consolidation_temperature=-1.0, length_boost=1.0)
    rng = np.random.default_rng(2)
    images = rng.standard_normal((2, 3, 64, 64)).astype(np.float32)
    prompt = rng.integers(3, 512, (2, 2))

    with torch.no_grad():
        ref_ids, ref_scores = RefBeam(ref, **kw)(
            torch.tensor(images), torch.tensor(prompt))
    our_ids, our_scores = BeamSearchTokenGenerator(model, **kw)(
        params, jnp.asarray(images), jnp.asarray(prompt))

    np.testing.assert_array_equal(np.asarray(our_ids), ref_ids.numpy())
    np.testing.assert_allclose(np.asarray(our_scores), ref_scores.numpy(),
                               rtol=1e-4, atol=1e-4)


def test_loss_engine_parity(tmp_path):
    """val_step and (corruption-free) train_step losses must match the
    reference wrapper: weighted CE at training_temperature with
    inverse_sqrt_position weights + eos_token_weight, contrastive loss
    with inf-filtering, and the momentum-distilled soft-target loss (the
    freshly-copied teacher makes the train path deterministic)."""
    torch, RefConfig, RefModel = _load_reference()
    sys.path.insert(0, REFERENCE)
    try:
        from configs.trainer import TrainerWrapperConfig as RefTWC
        from training.wrapper import ModelTrainerWrapper as RefWrapper
    finally:
        sys.path.remove(REFERENCE)
    import jax
    import jax.numpy as jnp

    from image2text_tpu.configs.models import VisionEncoderDecoderConfig
    from image2text_tpu.configs.trainer import TrainerWrapperConfig
    from image2text_tpu.training.wrapper import (
        ModelTrainerWrapper,
        TokenizerInfo,
    )
    from image2text_tpu.utils.checkpoint import (
        update_params_from_partial_checkpoint,
    )

    payload = _config_payload(**CAUSAL_CASE)
    trainer_payload = dict(
        moco_momentum=0.995, moco_alpha=0.4, training_temperature=2.0,
        training_contrastive_temperature=0.5,
        weight_fn="inverse_sqrt_position", eos_token_weight=3.0,
        mask_fraction=0.0, random_mask_fraction=0.2,
        add_contrastive_loss=True)
    tok = types.SimpleNamespace(eos_token_id=0, bos_token_id=1,
                                mask_token_id=2, vocab_size=512)

    torch.manual_seed(0)
    ref = RefWrapper(RefConfig.model_validate(payload), tok,
                     RefTWC.model_validate(trainer_payload)).eval()
    path = str(tmp_path / "ref.npz")
    np.savez(path, **{k: v.detach().numpy()
                      for k, v in ref.model.state_dict().items()})

    ours = ModelTrainerWrapper(
        VisionEncoderDecoderConfig.model_validate(payload),
        TokenizerInfo(eos_token_id=0, bos_token_id=1, mask_token_id=2,
                      vocab_size=512),
        TrainerWrapperConfig.model_validate(trainer_payload))
    params = ours.init(jax.random.PRNGKey(0))
    params = dict(params)
    params["model"] = update_params_from_partial_checkpoint(
        ours.model, params["model"], path)
    params["model_m"] = ours.copy_momentum_params(params)

    rng = np.random.default_rng(3)
    images = rng.standard_normal((3, 3, 64, 64)).astype(np.float32)
    labels = np.full((3, 20), -100, np.int64)
    for i, n in enumerate((18, 9, 2)):  # incl. a nearly-empty row
        labels[i, :n] = rng.integers(3, 512, n)

    with torch.no_grad():
        ref_loss, ref_metrics = ref.val_step(torch.tensor(images),
                                             torch.tensor(labels))
    loss, metrics = ours.val_step(params, jnp.asarray(images),
                                  jnp.asarray(labels))
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-4)
    for k, v in ref_metrics.items():
        np.testing.assert_allclose(float(metrics[k]), float(v), rtol=1e-4,
                                   err_msg=k)

    # train path: mask_fraction=0 → deterministic; teacher==student copy
    with torch.no_grad():
        ref_loss_t, ref_metrics_t = ref.train_step(torch.tensor(images),
                                                   torch.tensor(labels))
    loss_t, metrics_t = ours.train_step(params, jnp.asarray(images),
                                        jnp.asarray(labels),
                                        jax.random.PRNGKey(0))
    np.testing.assert_allclose(float(loss_t), float(ref_loss_t), rtol=1e-4)
    np.testing.assert_allclose(float(metrics_t["train_loss_lm"]),
                               float(ref_metrics_t["train_loss_lm"]),
                               rtol=1e-4)
