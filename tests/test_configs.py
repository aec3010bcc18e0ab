"""Config schema parity: every reference training YAML must parse unchanged."""
import glob
import os

import pytest
import yaml

from image2text_tpu.configs.models import (
    HuggingfaceDecoderConfig,
    PretrainedViTConfig,
    TransformerDecoderConfig,
    VisionTransformerEncoderConfig,
)
from image2text_tpu.configs.trainer import TrainingConfig

REFERENCE_CONFIG_DIR = "/root/reference/training_configs"
LOCAL_CONFIG_DIR = os.path.join(os.path.dirname(__file__), "..", "training_configs")


def _all_yamls(root):
    return sorted(glob.glob(os.path.join(root, "**", "*.yaml"), recursive=True))


@pytest.mark.parametrize("path", _all_yamls(REFERENCE_CONFIG_DIR)
                         if os.path.isdir(REFERENCE_CONFIG_DIR) else [])
def test_reference_yaml_parses(path):
    obj = yaml.safe_load(open(path))
    cfg = TrainingConfig.model_validate(obj)
    assert cfg.batch_size > 0
    assert cfg.model.use_cross_attn or cfg.model.use_soft_prompting


@pytest.mark.parametrize("path", _all_yamls(LOCAL_CONFIG_DIR))
def test_local_yaml_parses(path):
    obj = yaml.safe_load(open(path))
    cfg = TrainingConfig.model_validate(obj)
    assert cfg.batch_size > 0


def test_union_dispatch():
    """Encoder/decoder polymorphism is chosen by which union member the
    payload validates into (reference configs/models.py:129-130)."""
    if not os.path.isdir(REFERENCE_CONFIG_DIR):
        pytest.skip("reference not mounted")
    nano = yaml.safe_load(open(os.path.join(REFERENCE_CONFIG_DIR, "local", "nano.yaml")))
    cfg = TrainingConfig.model_validate(nano)
    assert isinstance(cfg.model.vision_encoder_config, PretrainedViTConfig)
    assert isinstance(cfg.model.decoder_config, TransformerDecoderConfig)
    assert cfg.model.decoder_config.pretrained_model is not None

    falcon = yaml.safe_load(open(os.path.join(REFERENCE_CONFIG_DIR, "gpu", "falcon-7b.yaml")))
    cfg = TrainingConfig.model_validate(falcon)
    assert isinstance(cfg.model.vision_encoder_config, VisionTransformerEncoderConfig)
    assert isinstance(cfg.model.decoder_config, HuggingfaceDecoderConfig)
    assert cfg.model.decoder_config.load_in_4bit


def test_defaults_match_reference_schema():
    from image2text_tpu.configs.models import (
        LoraSpec, SelfAttentionConfig, SelfAttentionType, TransformerConfig,
        MLPConfig, VisionEncoderDecoderConfig,
    )
    spec = LoraSpec()
    assert (spec.r, spec.lora_alpha, spec.lora_dropout) == (16, 64, 0.1)
    tc = TransformerConfig(
        rotator_config=MLPConfig(ff_mult=4.0),
        attn_config=SelfAttentionConfig(attn_type=SelfAttentionType.MULTI_HEAD))
    assert tc.sparsity_factor == 0.5 and not tc.is_sparse_attn
    assert tc.attn_config.n_head == 12 and tc.attn_config.n_embd == 768
