"""On-device autoregressive generation.

Two jit-able paths, both returning (B, prompt_len + max_new_tokens) ids:

* **KV-cached decode** (the TPU-native design): prefill the prompt once,
  then a ``lax.fori_loop`` of single-token decoder steps against a
  preallocated :class:`~image2text_tpu.models.kv_cache.KVCache` — O(T·L)
  attention instead of the reference's O(T²·L) full re-forwards
  (reference models/vision_encoder_decoder.py:136-182, which has no KV
  cache).  Exactness: the reference's window crop never slides (it asserts
  ``max_new_tokens <= blk_size - prompt_len``), and the soft-prompt prefix
  is computationally dead for text logits in the scratch decoder (text
  queries never attend prefix keys — vision_encoder_decoder.py:84-111), so
  skipping it and offsetting positions by ``space_for_prompt`` reproduces
  the full forward bit-for-bit (tested).
* **Full-reforward fallback** for models the cache cannot serve (per-layer
  random sparse attention): a fixed-size buffer is re-forwarded every step
  behind the model's own causal masks — the jit-able reformulation of the
  reference loop, same per-step cost.

Sampling semantics (temperature → no-repeat-ngram → top-k → nucleus →
multinomial) follow the reference pipeline exactly; see models/sampling.py.
Temperature <= 0 is an extension meaning greedy argmax.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from image2text_tpu.nn.core import Ctx, EVAL_CTX
from image2text_tpu.models.kv_cache import CacheRef, KVCache
from image2text_tpu.models.sampling import (apply_no_repeat_ngram,
                                            sample_logits,
                                            sample_topk_with_ngram)

EVAL = EVAL_CTX  # single shared eval context (nn.core)


def decoder_step(model, p, tok_ids: jax.Array, cache: KVCache,
                 pos_offset, cross: Optional[jax.Array],
                 use_flash: bool = True,
                 inputs_embeds: Optional[jax.Array] = None,
                 cross_kv=None):
    """One cached decoder forward on a (B, t) token chunk (or directly on
    embeddings, for soft-prompt prefill of prefix-causal decoders).

    Returns (logits (B, t, V), advanced cache)."""
    ref = CacheRef(cache)
    logits, _ = model.decoder(
        p["decoder"], idx=tok_ids, inputs_embeds=inputs_embeds,
        cross_attn_embeds=None if cross_kv else cross, attn_msk=None,
        kv_cache=ref, pos_offset=pos_offset, ctx=EVAL, use_flash=use_flash,
        cross_kv=cross_kv)
    return logits, ref.advanced()


def precompute_cross_kv(model, p, cross: Optional[jax.Array], quant=None):
    """Per-layer cross-attention K/V for decoders that support it."""
    if cross is None or not hasattr(model.decoder, "precompute_cross_kv"):
        return None
    return model.decoder.precompute_cross_kv(p["decoder"], cross, quant=quant)


def _sample_step(model, ids_buf, cur_len, last_logits, rng, temperature,
                 top_k, nucleus_p, approx_top_k=False):
    greedy = temperature is None or temperature <= 0
    if nucleus_p is None and (greedy or top_k is not None):
        # one-pass fused ngram-ban + top-k (exact; see
        # sampling.sample_topk_with_ngram) — the scatter path below costs
        # L-proportional time per step
        return sample_topk_with_ngram(
            last_logits, ids_buf, cur_len, model.no_repeat_n_grams, rng,
            temperature, top_k, approx=approx_top_k).astype(ids_buf.dtype)
    logits = apply_no_repeat_ngram(last_logits.astype(jnp.float32), ids_buf,
                                   cur_len, model.no_repeat_n_grams)
    if greedy:
        return jnp.argmax(logits, axis=-1).astype(ids_buf.dtype)
    return sample_logits(logits, rng, temperature, top_k,
                         nucleus_p).astype(ids_buf.dtype)


def generate(model, p, images, prompt_ids, max_new_tokens: int = 128,
             temperature: float = 1.0, top_k: Optional[int] = None,
             nucleus_p: Optional[float] = None,
             rng: Optional[jax.Array] = None, use_flash: bool = True,
             force_no_cache: bool = False,
             encoder_output: Optional[jax.Array] = None,
             cross_kv_quant: Optional[str] = None,
             approx_top_k: bool = False) -> jax.Array:
    """Sample captions; mirrors VisionEncoderDecoder.generate's contract
    (reference vision_encoder_decoder.py:136-182).

    ``cross_kv_quant='int8'`` enables the serving-mode quantized
    cross-attention memory (cached path only; the exact bf16 path is the
    default — see nn.modules.QuantizedKV).  ``approx_top_k=True`` is the
    opt-in approximate-top-k serving mode (sampling.sample_topk_with_ngram:
    ApproxTopK head pull, recall 0.95; bans never dropped, greedy
    unaffected); the exact pipeline stays the default."""
    if prompt_ids.ndim == 1:
        prompt_ids = prompt_ids[None]
    t0 = prompt_ids.shape[-1]
    blk_size = model.decoder.block_size - model.space_for_prompt
    assert max_new_tokens <= blk_size - t0, (
        f"max_new_tokens={max_new_tokens} exceeds the decoder window "
        f"({blk_size} - prompt {t0})")
    if rng is None:
        rng = jax.random.PRNGKey(0)
    if encoder_output is None:
        encoder_output = model.encoder(p["encoder"], images, ctx=EVAL)
    bs = encoder_output.shape[0]
    prompt_ids = jnp.broadcast_to(prompt_ids, (bs, t0))

    if not getattr(model.decoder, "is_causal", True):
        # Bidirectional decoder (the reference's unit test generates with
        # one, vision_encoder_decoder_test.py:90-92): every position's
        # logits see the whole sequence, so the fixed-size jit buffers
        # below would leak their uninitialised future slots into the
        # distribution.  Reproduce the reference's growing-sequence
        # re-forward exactly on the host (one compile per length).
        ids = prompt_ids
        for _ in range(max_new_tokens):
            cond = ids if ids.shape[-1] <= blk_size else ids[..., -blk_size:]
            out = model(p, images=None, ids=cond,
                        encoder_output=encoder_output, ctx=EVAL,
                        use_flash=use_flash)
            rng, key = jax.random.split(rng)
            nxt = _sample_step(model, ids, ids.shape[-1],
                               out.logits[:, -1], key, temperature, top_k,
                               nucleus_p, approx_top_k)
            ids = jnp.concatenate([ids, nxt[:, None]], axis=-1)
        return ids

    total = t0 + max_new_tokens
    ids_buf = jnp.zeros((bs, total), prompt_ids.dtype)
    ids_buf = jax.lax.dynamic_update_slice_in_dim(ids_buf, prompt_ids, 0, axis=1)

    # The decode loop samples from last-step logits in the COMPUTE dtype
    # (the encoder output's): under bf16 serving this is exactly torch's
    # autocast form (the reference's fp16 GPU runs produce fp16 logits,
    # decoder.py:343-361 under training/utils.py:96 autocast) and halves
    # every full-vocab pass of the per-step sampler — lm_head epilogue
    # write, threshold-gather reads, and the fori_loop carry (the sampler
    # itself is dtype-preserving and selection-exact, models/sampling.py).
    # f32 runs (tests, CPU parity) are untouched.
    cdt = encoder_output.dtype

    cross = encoder_output if model.use_cross_attn else None

    off = model.space_for_prompt
    use_cache = model.decoder.supports_kv_cache and not force_no_cache
    if use_cache and hasattr(model.decoder, "cache_exact_for_window"):
        # sparse layers whose global <2-selected bypass rule would flip
        # mid-window change earlier hidden states retroactively — only the
        # full-reforward fallback reproduces that
        use_cache = model.decoder.cache_exact_for_window(off + t0, off + total)
    if use_cache:
        prefix_in_decode = (getattr(model.decoder, "prefix_in_decode", False)
                            and model.use_soft_prompting)
        if prefix_in_decode:
            # HF decoders are plain-causal: the soft-prompt prefix occupies
            # real cache slots (reference decoder.py:343-360); prefill runs
            # on [prefix_embeds; prompt_embeds] at positions 0..
            cache = model.decoder.init_cache(bs, off + total,
                                             encoder_output.dtype)
            embeds = jnp.concatenate(
                [encoder_output,
                 model.decoder.get_inputs_embeds(p["decoder"], prompt_ids)
                 .astype(encoder_output.dtype)], axis=-2)
            logits, cache = decoder_step(model, p, None, cache, 0, cross,
                                         use_flash, inputs_embeds=embeds)
        else:
            # scratch decoder: the prefix is computationally dead for text
            # logits (see module docstring); skip it, offset positions
            cache = model.decoder.init_cache(bs, total, encoder_output.dtype)
            logits, cache = decoder_step(model, p, prompt_ids, cache, off,
                                         cross, use_flash)
        cross_kv = precompute_cross_kv(model, p, cross, quant=cross_kv_quant)

        def body(i, carry):
            ids_buf, cache, last_logits, rng = carry
            cur = t0 + i
            rng, key = jax.random.split(rng)
            nxt = _sample_step(model, ids_buf, cur, last_logits, key,
                               temperature, top_k, nucleus_p, approx_top_k)
            ids_buf = jax.lax.dynamic_update_slice(ids_buf, nxt[:, None],
                                                   (0, cur))
            logits, cache = decoder_step(model, p, nxt[:, None], cache,
                                         off + cur, cross, use_flash,
                                         cross_kv=cross_kv)
            return ids_buf, cache, logits[:, -1].astype(cdt), rng

        ids_buf, _, _, _ = jax.lax.fori_loop(
            0, max_new_tokens, body,
            (ids_buf, cache, logits[:, -1].astype(cdt), rng))
        return ids_buf

    # ---- full-reforward fallback (sparse-attention parity path) ----------
    def body(i, carry):
        ids_buf, rng = carry
        cur = t0 + i
        # sparse_rule_len: the reference re-forwards the GROWING sequence,
        # so its global <2-selected bypass rule sees the current length —
        # the fixed-size buffer must gate on it explicitly
        out = model(p, images=None, ids=ids_buf,
                    encoder_output=encoder_output, ctx=EVAL,
                    use_flash=use_flash, sparse_rule_len=off + cur)
        last = jnp.take_along_axis(
            out.logits, jnp.full((bs, 1, 1), cur - 1), axis=1)[:, 0].astype(cdt)
        rng, key = jax.random.split(rng)
        nxt = _sample_step(model, ids_buf, cur, last, key, temperature,
                           top_k, nucleus_p, approx_top_k)
        ids_buf = jax.lax.dynamic_update_slice(ids_buf, nxt[:, None], (0, cur))
        return ids_buf, rng

    ids_buf, _ = jax.lax.fori_loop(0, max_new_tokens, body, (ids_buf, rng))
    return ids_buf
