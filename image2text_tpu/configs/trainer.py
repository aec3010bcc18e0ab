"""Trainer configuration schema.

Parity with the reference's configs/trainer.py:1-41, plus TPU-specific
extensions (mesh shape, precision policy knobs) that default off so every
reference YAML parses unchanged.
"""
from __future__ import annotations

from typing import List, Optional, Tuple

from pydantic import BaseModel

from image2text_tpu.configs.models import VisionEncoderDecoderConfig


class TrainerWrapperConfig(BaseModel):
    moco_momentum: Optional[float] = None  # e.g. 0.995
    moco_alpha: Optional[float] = None  # e.g. 0.4
    training_temperature: float = 1.0
    weight_fn: str = "constant"
    mask_fraction: float = 0.0  # e.g. 0.15
    random_mask_fraction: float = 0.0  # e.g. 0.2
    eos_token_weight: Optional[float] = None
    add_contrastive_loss: bool = False  # only sensible with tied in/out embeddings
    training_contrastive_temperature: float = 1.0


class OptimizerConfig(BaseModel):
    lr: float
    weight_decay: float = 0.0
    betas: Tuple[float, float] = (0.9, 0.999)
    target_modules: Optional[List[str]] = None


class MeshConfig(BaseModel):
    """TPU extension: device mesh layout for pjit sharding.

    ``data`` × ``model`` must cover jax.device_count(); -1 on the data axis
    means "all remaining devices".
    """

    data: int = -1
    model: int = 1


class TrainingConfig(BaseModel):
    model: VisionEncoderDecoderConfig
    disable_flash: bool = False
    ignore_index: int = -100
    batch_size: int
    dataloader_buffer_size: int = 5
    shuffle: bool = True
    gradient_accumulation_steps: int = 1
    epochs: int = 1
    num_steps: Optional[int] = None
    num_val_steps: Optional[int] = None
    precision: str = "no"
    tokenizer_str: str
    reset_moco_after_k_epochs: Optional[List[int]] = None
    trainer: TrainerWrapperConfig
    optimizers: List[OptimizerConfig]
    use_snr_optim: bool = False
    # --- TPU extensions (absent from reference YAMLs; default off) ---
    mesh: MeshConfig = MeshConfig()
    seed: int = 0
    dataset: str = "flickr30k"  # or "synthetic" / "local" for offline runs
    dataset_dir: Optional[str] = None  # image dir for dataset: local
    profile_dir: Optional[str] = None  # jax.profiler trace output dir
    # ZeRO-1: shard optimizer moments over the mesh 'data' axis (cuts
    # optimizer HBM by the dp degree; XLA all-gathers updates over ICI)
    zero_sharded_optimizer: bool = False
    # Megatron-style sequence parallelism (requires mesh.model > 1): shard
    # the residual stream's sequence axis over 'model' at block boundaries
    # during training — activation/remat memory drops by the TP degree at
    # identical numerics and ICI bytes (parallel/sharding_rules.py::
    # set_sequence_parallel)
    sequence_parallel: bool = False
    # remat policy for per-block gradient checkpointing: None/'full' saves
    # only block inputs (reference semantics); 'dots' additionally saves
    # MXU (matmul) outputs, recomputing only cheap elementwise work —
    # memory↔recompute trade the boolean flag can't express
    # (training/remat.py; numerics unchanged either way)
    remat_policy: Optional[str] = None
    # bound on the outer epoch loop (TPU extension; the reference hardcodes
    # range(10000) and stops on data exhaustion — trainer.py:177.  `epochs`
    # bounds DATA epochs, which `num_steps` slices into many loop-epochs;
    # smoke/CI configs set this to finish in bounded time)
    max_loop_epochs: Optional[int] = None
