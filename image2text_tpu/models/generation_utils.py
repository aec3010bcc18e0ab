"""Batched *stochastic* beam search, fully on-device
(reference: models/generation_utils.py:10-148).

Semantics preserved exactly:

* encoder runs once and is tiled ``beam_width``× (beam-major layout);
* each round samples ``beam_expansion_factor`` candidates per beam —
  top-k when ``temperature <= 0``, otherwise multinomial *without
  replacement* (torch.multinomial default) realised with the Gumbel-top-k
  trick;
* sticky-EOS: beams whose last token is EOS keep emitting EOS with zero
  added score whenever the sampled continuation scores below
  ``-length_boost``; all other continuations receive the ``log(length_boost)``
  bonus (generation_utils.py:80-90);
* consolidation re-selects ``beam_width`` of bw×bef candidates by top-k or
  softmax sampling at ``consolidation_temperature`` (:130-148);
* loop ends when every beam contains an EOS or the length budget
  ``max_new_tokens + prompt_len - 1`` is reached (:46-51);
* returns ids (bs, bw, T) and cumulative log-scores (bs, bw) (:55).

TPU-native differences: a ``lax.while_loop`` over a fixed-size id buffer
replaces the growing-tensor Python loop, the heavy gather/transpose
choreography (:102-128) becomes ``best_pos // bef`` / ``% bef`` arithmetic +
``take_along_axis``, and decoding is KV-cached — consolidation gathers the
cache along the beam axis — instead of re-forwarding the whole sequence
every round (no KV cache in the reference).  Sparse-attention models use
the full-reforward fallback automatically.
"""
from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from image2text_tpu.nn.core import Ctx, EVAL_CTX
from image2text_tpu.models.generation import decoder_step, precompute_cross_kv
from image2text_tpu.models.sampling import (
    apply_no_repeat_ngram,
    apply_top_k,
    beam_candidates_with_ngram,
    chunked_top_k,
    gumbel_topk_sample,
)

EVAL = EVAL_CTX  # single shared eval context (nn.core)


class BeamSearchTokenGenerator:
    def __init__(self, model, beam_width: int = 3, temperature: float = 1.0,
                 top_k: Optional[int] = None, max_new_tokens: int = 64,
                 no_repeat_n_grams: Sequence[int] = (2, 3, 4),
                 beam_expansion_factor: int = 4,
                 eos_token_id: Optional[int] = None,
                 consolidation_temperature: float = 1.0,
                 length_boost: float = 1.0,
                 cross_kv_quant: Optional[str] = None):
        self.model = model
        self.beam_width = beam_width
        self.beam_expansion_factor = beam_expansion_factor
        self.max_new_tokens = max_new_tokens
        self.temperature = temperature
        self.consolidation_temperature = consolidation_temperature
        self.top_k = top_k
        self.eos_token_id = eos_token_id
        self.length_boost = math.log(length_boost)
        self.no_repeat_n_grams = tuple(no_repeat_n_grams)
        # serving-mode int8 cross-KV (see nn.modules.QuantizedKV): beams
        # tile the encoder memory beam_width×, so the per-step cross-K/V
        # re-read — the decode loop's dominant HBM term — scales with bw
        # and the 2× byte cut matters even more here
        self.cross_kv_quant = cross_kv_quant

    # -- per-round candidate scoring (reference decode_next, :57-93) --------
    def _candidates(self, last_logits, ids_flat, cur_len, rng):
        bef = self.beam_expansion_factor
        # fused ban + top-k + bef-select in one full-vocab pass (round-5:
        # the dense scatter-ban + full-vocab softmax/Gumbel below was the
        # beam loop's dominant per-step cost — see
        # sampling.beam_candidates_with_ngram); falls back to the dense
        # path for configs it cannot serve (full-vocab stochastic)
        fused = beam_candidates_with_ngram(
            last_logits, ids_flat, cur_len, self.no_repeat_n_grams, rng,
            self.temperature, self.top_k, bef)
        if fused is not None:
            next_id, log_scores = fused
        else:
            scores = apply_no_repeat_ngram(last_logits.astype(jnp.float32),
                                           ids_flat, cur_len,
                                           self.no_repeat_n_grams)
            scores = apply_top_k(scores, self.top_k)
            if self.temperature <= 0:
                prob = jax.nn.log_softmax(scores, axis=-1)
                _, next_id = chunked_top_k(scores, bef)  # small-k pull
                log_scores = jnp.take_along_axis(prob, next_id, axis=-1)
            else:
                prob = jax.nn.log_softmax(scores / self.temperature, axis=-1)
                next_id, log_scores = gumbel_topk_sample(prob, bef, rng)
        if self.eos_token_id is not None:
            last_tok = jnp.take_along_axis(
                ids_flat, jnp.full((ids_flat.shape[0], 1), cur_len - 1), axis=1)
            where_eos = last_tok == self.eos_token_id          # (rows, 1)
            sticky = jnp.logical_and(where_eos,
                                     log_scores + self.length_boost < 0)
            next_id = jnp.where(sticky, self.eos_token_id, next_id)
            log_scores = jnp.where(sticky, 0.0,
                                   log_scores + self.length_boost)
        return next_id, log_scores  # (rows, bef) each

    # -- consolidation (reference identify/gather_results, :95-148) ---------
    def _consolidate(self, cum, next_ids, next_scores, rng):
        bw, bs, bef = next_ids.shape
        expanded = (cum[:, :, None] + next_scores)             # (bw, bs, bef)
        expanded = expanded.transpose(1, 0, 2).reshape(bs, bw * bef)
        if self.consolidation_temperature <= 0:
            _, best_pos = jax.lax.top_k(expanded, bw)          # sorted desc
        else:
            logp = jax.nn.log_softmax(
                expanded / self.consolidation_temperature, axis=-1)
            best_pos, _ = gumbel_topk_sample(logp, bw, rng)
        beams_idx = best_pos // bef                            # (bs, bw)
        cand_idx = best_pos % bef
        chosen_ids = next_ids.transpose(1, 0, 2)[
            jnp.arange(bs)[:, None], beams_idx, cand_idx]      # (bs, bw)
        chosen_scores = next_scores.transpose(1, 0, 2)[
            jnp.arange(bs)[:, None], beams_idx, cand_idx]
        return beams_idx, chosen_ids.T, chosen_scores.T        # (bw, bs)

    def __call__(self, p, inputs, decoded_ids,
                 rng: Optional[jax.Array] = None,
                 encoder_output: Optional[jax.Array] = None,
                 use_flash: bool = True) -> Tuple[jax.Array, jax.Array]:
        model = self.model
        if not getattr(model.decoder, "is_causal", True):
            raise ValueError(
                "Beam search needs a causal decoder: with a bidirectional "
                "decoder every position's logits see the whole fixed-size "
                "id buffer, so the cached/fallback decode paths would leak "
                "unwritten future slots. Use model.generate (which has an "
                "exact growing-sequence path) for such models.")
        bw, bef = self.beam_width, self.beam_expansion_factor
        if rng is None:
            rng = jax.random.PRNGKey(0)
        if decoded_ids.ndim == 1:
            decoded_ids = decoded_ids[None]
        if encoder_output is None:
            encoder_output = model.encoder(p["encoder"], inputs, ctx=EVAL)
        bs, n_cls, n_embd = encoder_output.shape
        x = jnp.broadcast_to(encoder_output[None],
                             (bw, bs, n_cls, n_embd)).reshape(-1, n_cls, n_embd)
        t0 = decoded_ids.shape[-1]
        total = self.max_new_tokens + t0 - 1   # reference stop: :46-47
        ids = jnp.broadcast_to(decoded_ids[None], (bw, bs, t0))
        ids_buf = jnp.zeros((bw, bs, total), decoded_ids.dtype)
        ids_buf = jax.lax.dynamic_update_slice(ids_buf, ids, (0, 0, 0))
        cum = jnp.zeros((bw, bs), jnp.float32)
        cross = x if model.use_cross_attn else None
        use_cache = model.decoder.supports_kv_cache
        off = model.space_for_prompt
        if use_cache and hasattr(model.decoder, "cache_exact_for_window"):
            # see models/generation.py: sparse global-bypass transitions
            # mid-window are only exact under full re-forwarding
            use_cache = model.decoder.cache_exact_for_window(off + t0,
                                                             off + total)

        prefix_in_decode = (getattr(model.decoder, "prefix_in_decode", False)
                            and model.use_soft_prompting)
        if use_cache:
            if prefix_in_decode:
                cache = model.decoder.init_cache(bw * bs, off + total,
                                                 encoder_output.dtype)
                embeds = jnp.concatenate(
                    [x, model.decoder.get_inputs_embeds(
                        p["decoder"], ids.reshape(bw * bs, t0)).astype(x.dtype)],
                    axis=-2)
                logits, cache = decoder_step(model, p, None, cache, 0, cross,
                                             use_flash, inputs_embeds=embeds)
            else:
                cache = model.decoder.init_cache(bw * bs, total,
                                                 encoder_output.dtype)
                logits, cache = decoder_step(
                    model, p, ids.reshape(bw * bs, t0), cache, off, cross,
                    use_flash)
            last_logits = logits[:, -1]
            cross_kv = precompute_cross_kv(model, p, cross,
                                           quant=self.cross_kv_quant)
        else:
            cache = None
            cross_kv = None
            last_logits = self._full_logits(p, ids_buf, t0, encoder_output,
                                            use_flash)

        def not_done(carry):
            ids_buf, cum, cur_len, _, _, _ = carry[:6]
            more = cur_len < total
            if self.eos_token_id is None:
                return more
            pos_ok = jnp.arange(total)[None, None, :] < cur_len
            has_eos = jnp.any((ids_buf == self.eos_token_id) & pos_ok, axis=-1)
            return jnp.logical_and(more, jnp.logical_not(jnp.all(has_eos)))

        def body(carry):
            ids_buf, cum, cur_len, last_logits, rng, cache = carry
            rng, k_samp, k_cons = jax.random.split(rng, 3)
            ids_flat = ids_buf.reshape(bw * bs, total)
            next_ids, next_scores = self._candidates(
                last_logits, ids_flat, cur_len, k_samp)
            next_ids = next_ids.reshape(bw, bs, bef)
            next_scores = next_scores.reshape(bw, bs, bef)
            beams_idx, chosen_ids, chosen_scores = self._consolidate(
                cum, next_ids, next_scores, k_cons)
            # gather beams: new (nb, b) <- old (beams_idx[b, nb], b)
            ids_buf = jnp.take_along_axis(
                ids_buf, beams_idx.T[:, :, None], axis=0)
            cum = jnp.take_along_axis(cum, beams_idx.T, axis=0) + chosen_scores
            # append chosen tokens at cur_len
            onehot = jnp.arange(total)[None, None, :] == cur_len
            ids_buf = jnp.where(onehot, chosen_ids[:, :, None], ids_buf)
            if use_cache:
                order = (beams_idx.T * bs + jnp.arange(bs)[None, :]).reshape(-1)
                cache = cache.gather_batch(order)
                # cross K/V needs no beam shuffle: every beam of a sample
                # shares that sample's encoder output
                logits, cache = decoder_step(
                    model, p, chosen_ids.reshape(bw * bs, 1), cache,
                    off + cur_len, cross, use_flash, cross_kv=cross_kv)
                last_logits = logits[:, -1]
            else:
                last_logits = self._full_logits(
                    p, ids_buf, cur_len + 1, encoder_output, use_flash)
            return ids_buf, cum, cur_len + 1, last_logits, rng, cache

        carry = (ids_buf, cum, jnp.asarray(t0, jnp.int32), last_logits, rng,
                 cache)
        ids_buf, cum, cur_len, _, _, _ = jax.lax.while_loop(not_done, body,
                                                            carry)
        if self.eos_token_id is not None:
            # early exit (every beam finished) leaves the tail of the
            # fixed-size buffer unfilled; fill it with EOS — the sticky
            # rule's "finished beams keep emitting EOS" made concrete (the
            # reference returns a TRUNCATED tensor here instead,
            # generation_utils.py:46-55)
            pad = jnp.arange(total)[None, None, :] >= cur_len
            ids_buf = jnp.where(pad, self.eos_token_id, ids_buf)
        return ids_buf.transpose(1, 0, 2), cum.T  # (bs, bw, T), (bs, bw)

    def _full_logits(self, p, ids_buf, cur_len, encoder_output, use_flash):
        """Fallback: re-forward the whole buffer, read logits at cur_len-1.

        ``sparse_rule_len`` gates the sparse layers' global bypass rule at
        the current generated length, matching the reference's
        growing-sequence re-forward (see models/layers.py)."""
        bw, bs, total = ids_buf.shape
        enc = jnp.broadcast_to(
            encoder_output[None], (bw,) + encoder_output.shape).reshape(
                bw * bs, *encoder_output.shape[1:])
        out = self.model(p, images=None, ids=ids_buf.reshape(bw * bs, total),
                         encoder_output=enc, ctx=EVAL, use_flash=use_flash,
                         sparse_rule_len=self.model.space_for_prompt
                         + cur_len)
        return jnp.take_along_axis(
            out.logits, jnp.full((bw * bs, 1, 1), cur_len - 1), axis=1)[:, 0]
