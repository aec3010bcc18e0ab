"""image2text_tpu: a TPU-native (JAX/XLA/Pallas/pjit) image-captioning framework.

A ground-up re-design of the capabilities of iitmdinesh/image2text for TPU:
config-driven vision-encoder/decoder model zoo, soft-prompt and
cross-attention conditioning, momentum distillation, LoRA, MoE, sparse
attention, LSH/PEER heads, SNR-Adam, KV-cached on-device generation, and
pjit data-parallel training over a device mesh.
"""

__version__ = "0.1.0"
