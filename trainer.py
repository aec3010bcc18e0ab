"""CLI entry point (reference: trainer.py:105-212).

    python trainer.py --config_file training_configs/local/nano-mini.yaml \
        [--chkpt_file out.npz]

Same two flags, same YAML schema, same epoch loop structure
(train → qualitative eval → val).  Distribution is a pjit data-parallel
mesh instead of `accelerate launch` — run the SAME command on every host
of a multi-host TPU slice (jax.distributed handles coordination); there is
no per-device process fork on a single host.
"""
from __future__ import annotations

import sys
from argparse import ArgumentParser

import jax
import jax.numpy as jnp
import numpy as np
import yaml

from image2text_tpu.configs.models import PretrainedViTConfig
from image2text_tpu.configs.trainer import TrainingConfig
from image2text_tpu.parallel.mesh import (
    honor_platform_env,
    maybe_initialize_distributed,
)
from image2text_tpu.training.data import (
    SyntheticCompositeDataset,
    SyntheticFlickrDataset,
    WrapperDataLoader,
    get_flickr30k_dataloader,
)
from image2text_tpu.training.loop import Trainer
from image2text_tpu.training.tokenizer import get_tokenizer
from image2text_tpu.training.wrapper import ModelTrainerWrapper, TokenizerInfo


def eval_model(trainer: Trainer, tokenizer, val_iter, epoch: int,
               ignore_index: int, prompt=None, num_candidates: int = 4):
    """Qualitative val-time generation (reference trainer.py:27-65)."""
    print(f"Model perf at the end of the {epoch}-th epoch")
    print("Val:")
    images, labels = next(val_iter)
    x = jnp.broadcast_to(jnp.asarray(images[:1]),
                         (num_candidates, *images.shape[1:]))
    label_ = np.asarray(labels[0])
    prompt = tokenizer.bos_token if prompt is None \
        else " ".join([tokenizer.bos_token, prompt])
    decoded_ids = jnp.asarray(tokenizer(text=prompt).input_ids)[None]
    decoded_ids = jnp.broadcast_to(decoded_ids,
                                   (num_candidates, decoded_ids.shape[-1]))
    model = trainer.wrapper.model
    window = model.decoder.block_size - model.space_for_prompt
    max_new = min(128, window - decoded_ids.shape[-1])
    result = model.generate(trainer.state.params["model"], x, decoded_ids,
                            temperature=0.7, max_new_tokens=max_new,
                            nucleus_p=0.6,
                            rng=jax.random.fold_in(trainer.rng, epoch))
    result_txt = tokenizer.batch_decode(np.asarray(result)[:, 1:])
    reference = tokenizer.batch_decode([label_[label_ != ignore_index]])[0]
    print("truth", reference, "\n")
    for gen in result_txt:
        i = gen.find(tokenizer.eos_token)
        print(gen[:i] if i >= 0 else gen)


def build_inner_datasets(config: TrainingConfig, tokenizer):
    """(train, val) inner datasets yielding raw 5-caption batch dicts.

    Multi-host: each process builds its OWN local data stream —
    flickr30k/local rows are host-strided inside the loaders, the
    synthetic stream and shuffles are seeded per process — because
    ``shard_batch`` assembles the global batch from per-process local
    slices (split_batches parity demands distinct data per rank)."""
    host = jax.process_index()
    seed = config.seed + host * 1_000_003
    inner_bs = config.dataloader_buffer_size * config.batch_size
    if config.dataset in ("synthetic", "synthetic-composite"):
        image_size = 224 if isinstance(config.model.vision_encoder_config,
                                       PretrainedViTConfig) else \
            config.model.vision_encoder_config.input.width
        vocab = config.model.decoder_config.vocab_size
        cls = (SyntheticCompositeDataset
               if config.dataset == "synthetic-composite"
               else SyntheticFlickrDataset)
        train_ds = cls(
            27000, inner_bs, image_size=image_size, vocab_size=vocab,
            eos_token_id=tokenizer.eos_token_id, seed=seed)
        val_ds = cls(
            4000, inner_bs, image_size=image_size, vocab_size=vocab,
            eos_token_id=tokenizer.eos_token_id, seed=seed + 1)
    elif config.dataset == "local":
        from image2text_tpu.training.data import get_local_dataloader

        train_ds, val_ds = get_local_dataloader(
            tokenizer, inner_bs, config.shuffle,
            isinstance(config.model.vision_encoder_config,
                       PretrainedViTConfig),
            dataset_dir=config.dataset_dir)
    else:
        train_ds, val_ds = get_flickr30k_dataloader(
            tokenizer, inner_bs, config.shuffle,
            isinstance(config.model.vision_encoder_config, PretrainedViTConfig))
    return train_ds, val_ds


def build_dataloaders(config: TrainingConfig, tokenizer):
    """train/val WrapperDataLoaders from the configured dataset."""
    host = jax.process_index()
    seed = config.seed + host * 1_000_003
    train_ds, val_ds = build_inner_datasets(config, tokenizer)
    train_dl = WrapperDataLoader(train_ds, batch_size=config.batch_size,
                                 ignore_idx=config.ignore_index,
                                 epochs=config.epochs, seed=seed)
    val_dl = WrapperDataLoader(val_ds, batch_size=config.batch_size,
                               ignore_idx=config.ignore_index, epochs=100000,
                               seed=seed + 1)
    return train_dl, val_dl


def main(args):
    from image2text_tpu.utils.compile_cache import setup_compile_cache

    honor_platform_env()
    setup_compile_cache()
    maybe_initialize_distributed()
    with open(args.config_file) as f:
        config = TrainingConfig.model_validate(yaml.safe_load(f))
    if jax.process_index() == 0:
        print(config)

    tokenizer = get_tokenizer(
        config.tokenizer_str, config.trainer.mask_fraction,
        synthetic_vocab=config.model.decoder_config.vocab_size,
        # synthetic data carries no linguistic content, so a missing HF
        # cache may substitute the synthetic tokenizer; real-data runs must
        # fail instead of training on meaningless token ids
        allow_fallback=config.dataset.startswith("synthetic"))
    train_dl, val_dl = build_dataloaders(config, tokenizer)

    wrapper = ModelTrainerWrapper(
        model_config=config.model,
        tokenizer=TokenizerInfo.from_tokenizer(tokenizer),
        trainer_config=config.trainer,
        ignore_index=config.ignore_index)
    params = wrapper.init(jax.random.PRNGKey(config.seed))
    trainer = Trainer(config, wrapper, params)
    import os

    if args.resume_dir:
        # full-state resume (params + optimizer + step) — beyond the
        # reference, which restarts from model weights only (SURVEY §5.4).
        # Multi-host: resume_dir must live on SHARED storage — orbax
        # save/restore are cross-host collectives, and every process must
        # agree on whether the checkpoint exists
        exists = os.path.isdir(args.resume_dir)
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            agree = multihost_utils.process_allgather(
                jnp.asarray([exists], jnp.int32))
            assert int(agree.min()) == int(agree.max()), (
                f"{args.resume_dir} exists on some hosts but not others — "
                "resume_dir must be shared storage")
        if exists:
            trainer.restore_state(args.resume_dir)
            print(f"resumed train state from {args.resume_dir} "
                  f"(step {int(trainer.state.step)})")

    from image2text_tpu.training.data import Prefetcher

    train_iter, val_iter = Prefetcher(train_dl), Prefetcher(val_dl)
    n_loop = 10000 if config.max_loop_epochs is None else config.max_loop_epochs
    for epoch in range(n_loop):
        stop = trainer.train_loop(train_iter, epoch,
                                  chkpt_fname=args.chkpt_file)
        if args.resume_dir:
            # EVERY process calls: orbax PyTreeCheckpointer.save is a
            # multi-host collective (a rank-0 gate would deadlock the
            # barrier and could not read other hosts' ZeRO shards)
            trainer.save_state(args.resume_dir)
        if stop:
            break
        eval_model(trainer, tokenizer, val_iter, epoch, config.ignore_index)
        loss, metrics = trainer.val_loop(val_iter, epoch)
        if jax.process_index() == 0:
            print(f"Epoch: {epoch}, loss: {loss}, metrics: {metrics}")


def parse_args(argv=None):
    parser = ArgumentParser()
    parser.add_argument("--config_file", required=True, type=str)
    parser.add_argument("--chkpt_file", required=False, type=str, default=None)
    parser.add_argument("--resume_dir", required=False, type=str, default=None,
                        help="orbax dir for full-train-state save/resume")
    return parser.parse_args(argv)


if __name__ == "__main__":
    main(parse_args(sys.argv[1:]))
