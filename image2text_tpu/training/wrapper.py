"""Trainer wrapper: the loss engine (reference: training/wrapper.py:13-214).

Pure-function redesign of the reference's stateful nn.Module: the wrapper
owns the model *structure* and the trainer hyperparameters; all state
(student params under ``model``, EMA teacher under ``model_m``) lives in the
parameter tree, so ``train_step``/``val_step`` are jit-able pure functions
and the EMA update is a ``tree_map`` returning the successor teacher tree
(reference _momentum_update, wrapper.py:53-60).

Loss semantics preserved exactly:

* input construction — labels→input_ids with EOS fill, BERT-style mask
  corruption (mask_fraction / random_mask_fraction), BOS prepend +
  truncation (wrapper.py:153-196);
* ``get_weights`` — 'constant' | 'inverse_sqrt_position' schedules,
  eos_token_weight override, per-sequence + per-batch normalisation
  (wrapper.py:80-96);
* ``compute_lm_loss`` — per-token weighted CE at ``training_temperature``,
  or ALBEF-style momentum-distilled soft targets
  α·softmax(teacher/T) + (1−α)·onehot (wrapper.py:120-151);
* ``compute_contrastive_loss`` — hidden states vs target token embeddings,
  in-batch all-positions CE with inf filtering (wrapper.py:98-118).
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from image2text_tpu.configs.models import VisionEncoderDecoderConfig
from image2text_tpu.configs.trainer import TrainerWrapperConfig
from image2text_tpu.nn.core import Ctx, Module
from image2text_tpu.models.vision_encoder_decoder import VisionEncoderDecoder


class TokenizerInfo:
    """The three special-token ids the wrapper needs (host-side tokenizer
    stays out of the jitted path)."""

    def __init__(self, eos_token_id: int, bos_token_id: int,
                 mask_token_id: Optional[int] = None,
                 vocab_size: Optional[int] = None):
        self.eos_token_id = eos_token_id
        self.bos_token_id = bos_token_id
        self.mask_token_id = mask_token_id
        self.vocab_size = vocab_size

    @classmethod
    def from_tokenizer(cls, tok) -> "TokenizerInfo":
        return cls(eos_token_id=tok.eos_token_id, bos_token_id=tok.bos_token_id,
                   mask_token_id=getattr(tok, "mask_token_id", None),
                   vocab_size=tok.vocab_size)


class ModelTrainerWrapper(Module):
    def __init__(self, model_config: VisionEncoderDecoderConfig,
                 tokenizer: TokenizerInfo,
                 trainer_config: TrainerWrapperConfig,
                 ignore_index: int = -100):
        super().__init__()
        self.model = self.add("model", VisionEncoderDecoder(model_config))
        self.is_momentum = (trainer_config.moco_momentum is not None
                            and trainer_config.moco_alpha is not None)
        if self.is_momentum:
            # separate Module instance: the teacher tree holds its own copy
            self.model_m = self.add("model_m", VisionEncoderDecoder(model_config))
        else:
            self.model_m = None
        self.tokenizer = tokenizer
        self.ignore_index = ignore_index
        self.temperature = trainer_config.training_temperature
        self.contrastive_temperature = trainer_config.training_contrastive_temperature
        self.weight_fn = trainer_config.weight_fn
        self.mask_fraction = trainer_config.mask_fraction
        self.random_mask_fraction = trainer_config.random_mask_fraction
        self.eos_token_weight = trainer_config.eos_token_weight
        self.momentum = trainer_config.moco_momentum
        self.alpha = trainer_config.moco_alpha
        self.add_contrastive_loss = trainer_config.add_contrastive_loss

    # -- teacher state ------------------------------------------------------
    def init(self, key, path: str = ""):
        params = super().init(key, path)
        if self.is_momentum:
            params["model_m"] = self.copy_momentum_params(params)
        return params

    def copy_momentum_params(self, params):
        """Teacher ← student full copy (reference wrapper.py:46-51).

        A *materialised* copy: aliasing the student's buffers would make the
        state tree contain the same buffer twice, which breaks donation in
        the jitted train step."""
        return jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True),
                                      params["model"])

    def momentum_update(self, params):
        """EMA teacher update (reference wrapper.py:53-60); returns the new
        ``model_m`` subtree.

        Floating leaves only: the reference EMAs ``named_parameters()``, so
        integer buffers (sparse index tables, LSH offsets) stay at their
        copied values — EMA-ing them would also promote them to float and
        change the state tree's dtype signature (recompile + restore
        breakage)."""
        m = self.momentum

        def ema(pm, ps):
            if not jnp.issubdtype(pm.dtype, jnp.floating):
                return pm
            return pm * m + ps.astype(pm.dtype) * (1.0 - m)

        return jax.tree_util.tree_map(ema, params["model_m"],
                                      params["model"])

    # -- loss weights (reference wrapper.py:80-96) --------------------------
    def get_weights(self, labels: jax.Array) -> jax.Array:
        bs, sl = labels.shape
        if self.weight_fn == "constant":
            weights = jnp.ones((bs, sl), jnp.float32)
        elif self.weight_fn == "inverse_sqrt_position":
            weights = jnp.broadcast_to(
                1.0 / jnp.sqrt(jnp.arange(1, sl + 1, dtype=jnp.float32))[None],
                (bs, sl))
        else:
            raise ValueError(f"unknown weight_fn: {self.weight_fn}")
        if self.eos_token_weight is not None:
            weights = jnp.where(labels == self.tokenizer.eos_token_id,
                                self.eos_token_weight, weights)
        weights = jnp.where(labels == self.ignore_index, 0.0, weights)
        return (weights / (1e-3 + weights.sum(axis=-1, keepdims=True))) / bs

    # -- losses -------------------------------------------------------------
    def compute_lm_loss(self, lm_logits, labels, lm_logits_moco=None):
        labels = labels[..., :lm_logits.shape[-2]]
        if lm_logits.shape[-2] > labels.shape[-1]:
            lm_logits = lm_logits[..., :labels.shape[-1], :]
            if lm_logits_moco is not None:
                lm_logits_moco = lm_logits_moco[..., :labels.shape[-1], :]
        weights = self.get_weights(labels)
        lm_logits = lm_logits.astype(jnp.float32)
        safe_labels = jnp.where(labels == self.ignore_index, 0, labels)

        if lm_logits_moco is not None:
            num_classes = lm_logits.shape[-1]
            onehot = jax.nn.one_hot(safe_labels, num_classes, dtype=jnp.float32)
            onehot = jnp.where((labels == self.ignore_index)[..., None], 0.0,
                               onehot)
            soft = jax.nn.softmax(
                lm_logits_moco.astype(jnp.float32) / self.temperature, axis=-1)
            targets = self.alpha * soft + (1.0 - self.alpha) * onehot
            logp = jax.nn.log_softmax(lm_logits / self.temperature, axis=-1)
            return -jnp.sum(jnp.sum(logp * targets, axis=-1) * weights)

        logp = jax.nn.log_softmax(lm_logits / self.temperature, axis=-1)
        nll = -jnp.take_along_axis(logp, safe_labels[..., None], axis=-1)[..., 0]
        nll = jnp.where(labels == self.ignore_index, 0.0, nll)
        return jnp.sum(nll * weights)

    def compute_contrastive_loss(self, params, hidden_state, labels):
        labels = labels[..., :hidden_state.shape[-2]]
        if hidden_state.shape[-2] > labels.shape[-1]:
            hidden_state = hidden_state[..., :labels.shape[-1], :]
        weights = self.get_weights(labels)
        attn_mask = labels != self.ignore_index
        target_ids = jnp.where(attn_mask, labels, 0)
        hidden_target = self.model.decoder.get_inputs_embeds(
            params["model"]["decoder"], target_ids)

        d = hidden_state.shape[-1]
        h = hidden_state.reshape(-1, d).astype(jnp.float32)
        t = hidden_target.reshape(-1, d).astype(jnp.float32)
        predictions = h @ t.T  # (N, N)
        predictions = jnp.where(attn_mask.reshape(1, -1), predictions, -jnp.inf)
        logits = predictions / self.contrastive_temperature
        n = logits.shape[0]
        logp = jax.nn.log_softmax(logits, axis=-1)
        losses = -logp[jnp.arange(n), jnp.arange(n)]
        losses = jnp.where(jnp.isinf(losses), 0.0, losses)  # empty rows
        return jnp.sum(losses * weights.reshape(-1))

    # -- step helpers (reference wrapper.py:153-214) ------------------------
    def build_inputs(self, labels: jax.Array, is_train: bool,
                     rng: Optional[jax.Array]):
        """labels → (corrupted BOS-prepended input_ids, bool attn mask)."""
        tok = self.tokenizer
        input_ids = jnp.where(labels != self.ignore_index, labels,
                              tok.eos_token_id)
        attn_msk = labels != self.ignore_index

        if is_train and self.mask_fraction > 0:
            assert rng is not None and tok.mask_token_id is not None
            k1, k2, k3 = jax.random.split(jax.random.fold_in(rng, 17), 3)
            random_ids = jax.random.randint(k3, input_ids.shape, 0,
                                            tok.vocab_size, input_ids.dtype)
            corrupted_mask = jnp.where(
                jax.random.uniform(k2, input_ids.shape) <= self.random_mask_fraction,
                random_ids, tok.mask_token_id)
            corrupted = jnp.where(
                jax.random.uniform(k1, input_ids.shape) <= self.mask_fraction,
                corrupted_mask, input_ids)
            corrupted = jnp.where(labels != self.ignore_index, corrupted,
                                  tok.eos_token_id)
        else:
            corrupted = input_ids

        bs, sl = corrupted.shape
        bos = jnp.full((bs, 1), tok.bos_token_id, corrupted.dtype)
        corrupted = jnp.concatenate([bos, corrupted], axis=1)[:, :sl]
        attn_msk = jnp.concatenate(
            [jnp.ones((bs, 1), bool), attn_msk], axis=1)[:, :sl]
        return corrupted, attn_msk

    def _step(self, params, images, labels, is_train: bool,
              rng: Optional[jax.Array] = None, use_flash: bool = True
              ) -> Tuple[jax.Array, Dict[str, jax.Array]]:
        corrupted, attn_msk = self.build_inputs(labels, is_train, rng)
        ctx = Ctx(rng=jax.random.fold_in(rng, 23), train=True) \
            if (is_train and rng is not None) else Ctx(rng=None, train=False)
        out = self.model(params["model"], images, corrupted,
                         attn_msk=attn_msk, ctx=ctx, use_flash=use_flash)
        if self.is_momentum and is_train:
            # the reference keeps the whole wrapper in train mode, so the
            # teacher's dropout stays ACTIVE inside torch.no_grad
            # (training/utils.py:76-81 → wrapper.py:200-202) — give it its
            # own dropout stream rather than running it deterministically
            mctx = Ctx(rng=jax.random.fold_in(rng, 29), train=True) \
                if rng is not None else Ctx(rng=None, train=False)
            out_m = self.model_m(
                jax.lax.stop_gradient(params["model_m"]), images, corrupted,
                attn_msk=attn_msk, ctx=mctx, use_flash=use_flash)
            lm_logits_moco = jax.lax.stop_gradient(out_m.logits)
        else:
            lm_logits_moco = None
        step = "train" if is_train else "val"
        loss = self.compute_lm_loss(out.logits, labels, lm_logits_moco)
        metrics = {f"{step}_loss_lm": jax.lax.stop_gradient(loss)}
        if self.add_contrastive_loss:
            loss_c = self.compute_contrastive_loss(params, out.hidden_state,
                                                   labels)
            metrics[f"{step}_loss_contrastive"] = jax.lax.stop_gradient(loss_c)
            loss = loss + loss_c
        return loss, metrics

    def train_step(self, params, images, labels, rng, use_flash: bool = True):
        """Pure loss fn for value_and_grad.  The EMA update is applied by the
        training loop after the gradient step (reference applies it inside
        train_step, wrapper.py:212 — ordering is equivalent because the
        teacher never receives gradients)."""
        return self._step(params, images, labels, True, rng, use_flash)

    def val_step(self, params, images, labels, use_flash: bool = True):
        return self._step(params, images, labels, False, None, use_flash)
