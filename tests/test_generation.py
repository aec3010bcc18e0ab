"""Generation-stack tests: KV-cache exactness, sampling-op parity with HF,
and beam-search semantics."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image2text_tpu.models.generation import decoder_step
from image2text_tpu.models.generation_utils import BeamSearchTokenGenerator
from image2text_tpu.models.sampling import (
    apply_top_k,
    no_repeat_ngram_bias,
    nucleus_sample,
)
from image2text_tpu.models.vision_encoder_decoder import VisionEncoderDecoder
from image2text_tpu.nn.core import Ctx

from test_vision_encoder_decoder import tiny_config

KEY = jax.random.PRNGKey(0)
EVAL = Ctx(rng=None, train=False)


def _model_and_inputs(b=2, seed=0, **cfg_kwargs):
    config = tiny_config(**cfg_kwargs)
    model = VisionEncoderDecoder(config)
    params = model.init(KEY)
    rng = np.random.default_rng(seed)
    img = jnp.asarray(rng.standard_normal((b, 3, 64, 64)), jnp.float32)
    return model, params, img


# ---------------------------------------------------------------------------
# KV cache
# ---------------------------------------------------------------------------

def test_cached_decode_matches_full_forward():
    """Incremental cached logits must equal the slice of a full forward."""
    model, params, img = _model_and_inputs()
    rng = np.random.default_rng(1)
    ids = jnp.asarray(rng.integers(0, 1024, (2, 12)))
    full = model(params, img, ids)
    enc = full.encoder_output
    cross = enc if model.use_cross_attn else None

    cache = model.decoder.init_cache(2, 12, jnp.float32)
    off = model.space_for_prompt
    # prefill 8, then step 4 single tokens
    logits_a, cache = decoder_step(model, params, ids[:, :8], cache, off, cross)
    chunks = [logits_a]
    for i in range(8, 12):
        li, cache = decoder_step(model, params, ids[:, i:i + 1], cache,
                                 off + i, cross)
        chunks.append(li)
    cached = jnp.concatenate(chunks, axis=1)
    np.testing.assert_allclose(np.asarray(cached), np.asarray(full.logits),
                               atol=2e-4, rtol=1e-4)


def test_generate_cached_equals_fallback():
    """Greedy + sampled generation agree between the cached path and the
    full-reforward fallback (both consume identical rng streams)."""
    model, params, img = _model_and_inputs()
    prompt = jnp.asarray([[1, 2, 3], [4, 5, 6]])
    for kwargs in (dict(temperature=0.0),
                   dict(temperature=0.8, top_k=16, rng=jax.random.PRNGKey(7)),
                   dict(temperature=0.7, nucleus_p=0.6,
                        rng=jax.random.PRNGKey(9))):
        fast = model.generate(params, img, prompt, max_new_tokens=10, **kwargs)
        slow = model.generate(params, img, prompt, max_new_tokens=10,
                              force_no_cache=True, **kwargs)
        np.testing.assert_array_equal(np.asarray(fast), np.asarray(slow))


def test_generate_shape_and_prompt_preserved():
    model, params, img = _model_and_inputs()
    prompt = jnp.asarray([[11, 22], [33, 44]])
    out = model.generate(params, img, prompt, max_new_tokens=6,
                         temperature=0.9, rng=jax.random.PRNGKey(3))
    assert out.shape == (2, 8)
    np.testing.assert_array_equal(np.asarray(out[:, :2]), np.asarray(prompt))


def test_generate_sparse_cached_equals_fallback():
    """Sparse-attention decoders decode against rank-among-selected cache
    slots; results must equal the reference-parity full-reforward path."""
    model, params, img = _model_and_inputs(sparse=True, advanced_pos_emb=True,
                                           block_size=64)
    assert model.decoder.supports_kv_cache
    for t0 in (1, 4):  # prefill with and without selected prompt positions
        prompt = jnp.asarray(np.arange(1, 1 + t0)[None].repeat(2, 0))
        for kwargs in (dict(temperature=0.0),
                       dict(temperature=0.8, top_k=8,
                            rng=jax.random.PRNGKey(3))):
            fast = model.generate(params, img, prompt, max_new_tokens=8,
                                  **kwargs)
            slow = model.generate(params, img, prompt, max_new_tokens=8,
                                  force_no_cache=True, **kwargs)
            np.testing.assert_array_equal(np.asarray(fast), np.asarray(slow),
                                          err_msg=f"t0={t0} {kwargs}")


def test_generate_sparse_no_prefix_cached_equals_fallback():
    """Cross-attn-only sparse model: with no always-selected CLS prefix the
    reference's global bypass rule (<2 positions selected at the current
    length → EVERY position takes the null path, layers.py:570-577) is
    reachable during early decode steps; the cached gate must reproduce it
    exactly (cumulative-selected-count gating)."""
    model, params, img = _model_and_inputs(sparse=True, block_size=64,
                                           use_soft_prompting=False)
    assert model.decoder.supports_kv_cache
    for t0 in (1, 2):
        prompt = jnp.asarray(np.arange(1, 1 + t0)[None].repeat(2, 0))
        fast = model.generate(params, img, prompt, max_new_tokens=8,
                              temperature=0.0)
        slow = model.generate(params, img, prompt, max_new_tokens=8,
                              temperature=0.0, force_no_cache=True)
        np.testing.assert_array_equal(np.asarray(fast), np.asarray(slow),
                                      err_msg=f"t0={t0}")


def test_beam_search_sparse_cached_equals_fallback():
    model, params, img = _model_and_inputs(sparse=True, block_size=64)
    gen = BeamSearchTokenGenerator(model, beam_width=2, temperature=0.0,
                                   max_new_tokens=5, beam_expansion_factor=2,
                                   consolidation_temperature=0.0)
    prompt = jnp.asarray([[1, 2], [3, 4]])
    ids_fast, sc_fast = gen(params, img, prompt)
    cls = model.decoder.__class__
    orig = cls.supports_kv_cache
    try:
        cls.supports_kv_cache = property(lambda self: False)
        ids_slow, sc_slow = gen(params, img, prompt)
    finally:
        cls.supports_kv_cache = orig
    np.testing.assert_array_equal(np.asarray(ids_fast), np.asarray(ids_slow))
    np.testing.assert_allclose(np.asarray(sc_fast), np.asarray(sc_slow),
                               atol=1e-4)


def test_generate_jit():
    model, params, img = _model_and_inputs()
    prompt = jnp.asarray([[1, 2], [3, 4]])

    @jax.jit
    def gen(p, img, prompt, rng):
        return model.generate(p, img, prompt, max_new_tokens=4,
                              temperature=0.8, top_k=8, rng=rng)

    out = gen(params, img, prompt, jax.random.PRNGKey(0))
    assert out.shape == (2, 6)


# ---------------------------------------------------------------------------
# Sampling ops
# ---------------------------------------------------------------------------

def test_no_repeat_ngram_matches_hf():
    """Fixed-shape ngram bias == HF NoRepeatNGramLogitsProcessor on random
    sequences (the reference relies on the HF implementation,
    vision_encoder_decoder.py:40-43)."""
    torch = pytest.importorskip("torch")
    from transformers import NoRepeatNGramLogitsProcessor

    rng = np.random.default_rng(0)
    vocab = 13
    for n in (2, 3, 4):
        for cur in (5, 9, 16):
            ids = rng.integers(0, 4, (3, cur))  # small vocab → many repeats
            buf = np.zeros((3, 20), np.int64)
            buf[:, :cur] = ids
            ours = np.asarray(no_repeat_ngram_bias(
                jnp.asarray(buf), jnp.asarray(cur), vocab, (n,)))
            proc = NoRepeatNGramLogitsProcessor(ngram_size=n)
            scores = torch.zeros((3, vocab))
            theirs = proc(torch.tensor(ids), scores).numpy()
            np.testing.assert_array_equal(ours == -np.inf, theirs == -np.inf,
                                          err_msg=f"n={n} cur={cur}")


def test_sample_topk_with_ngram_matches_scatter_path():
    """The fused one-pass ngram+top-k sampler draws the IDENTICAL token as
    the scatter path (apply_no_repeat_ngram → sample_logits) under the same
    rng key, greedy and sampled, across current lengths — exactness of the
    ban-after-top-(k+M) containment argument."""
    from image2text_tpu.models.sampling import (apply_no_repeat_ngram,
                                                sample_logits,
                                                sample_topk_with_ngram)

    rng = np.random.default_rng(7)
    vocab, b, l = 5000, 4, 40
    ns = (2, 3, 4, 5)
    for cur in (3, 9, 21, 39):
        # small id range ⇒ the suffix reliably matches earlier windows
        buf = jnp.asarray(
            np.where(np.arange(l) < cur,
                     rng.integers(0, 6, (b, l)), 0).astype(np.int32))
        logits = jnp.asarray(rng.standard_normal((b, vocab)), jnp.float32)
        banned = apply_no_repeat_ngram(logits, buf, jnp.asarray(cur), ns)
        assert bool((banned == -np.inf).any()), "case must exercise bans"
        # greedy: fused == argmax over the scatter-banned logits
        got = np.asarray(sample_topk_with_ngram(
            logits, buf, jnp.asarray(cur), ns, jax.random.PRNGKey(0),
            0.0, None))
        np.testing.assert_array_equal(got, np.asarray(jnp.argmax(banned, -1)))
        # sampled: same rng ⇒ identical draw as the scatter + top-k path
        key = jax.random.PRNGKey(cur)
        got = np.asarray(sample_topk_with_ngram(
            logits, buf, jnp.asarray(cur), ns, key, 0.7, 16))
        want = np.asarray(sample_logits(banned, key, 0.7, 16))
        np.testing.assert_array_equal(got, want)


def test_sample_topk_with_ngram_fallback_when_head_saturated():
    """The small-head fast path must DETECT saturation (more banned ids in
    the top-(k+32) head than the margin) and fall back to the exact k+M
    pull: plant the top ~40 logits on 1-gram-banned ids so the fast head
    is mostly bans, and check the fused sampler still returns the best
    unbanned token (greedy) / the scatter-path draw (sampled)."""
    from image2text_tpu.models.sampling import (apply_no_repeat_ngram,
                                                sample_logits,
                                                sample_topk_with_ngram)

    rng = np.random.default_rng(11)
    vocab, b, l = 3000, 3, 60
    cur = 59
    ns = (1,)  # every seen token is banned
    seen = rng.permutation(vocab)[:l]
    buf = jnp.asarray(np.tile(seen, (b, 1)).astype(np.int32))
    logits = np.asarray(rng.standard_normal((b, vocab)), np.float32)
    # 45 of the 59 banned ids get the HIGHEST logits: the top-(1+32) and
    # top-(16+32) heads are saturated with bans in every row
    logits[:, seen[:45]] += 100.0
    logits = jnp.asarray(logits)
    banned = apply_no_repeat_ngram(logits, buf, jnp.asarray(cur), ns)
    got = np.asarray(sample_topk_with_ngram(
        logits, buf, jnp.asarray(cur), ns, jax.random.PRNGKey(0), 0.0, None))
    np.testing.assert_array_equal(got, np.asarray(jnp.argmax(banned, -1)))
    key = jax.random.PRNGKey(3)
    got = np.asarray(sample_topk_with_ngram(
        logits, buf, jnp.asarray(cur), ns, key, 0.7, 16))
    want = np.asarray(sample_logits(banned, key, 0.7, 16))
    np.testing.assert_array_equal(got, want)


def test_top_k_masking():
    logits = jnp.asarray([[1.0, 5.0, 3.0, 2.0, 4.0]])
    out = np.asarray(apply_top_k(logits, 2))
    assert np.isneginf(out[0, [0, 2, 3]]).all()
    assert out[0, 1] == 5.0 and out[0, 4] == 4.0


def test_nucleus_guarantees_one_token():
    """A peaked distribution with p below the top prob must still sample the
    top token (reference's max(p, p0) guard, vision_encoder_decoder.py:166)."""
    probs = jnp.asarray([[0.9, 0.05, 0.05]])
    for seed in range(5):
        tok = np.asarray(nucleus_sample(probs, 0.5, jax.random.PRNGKey(seed)))
        assert tok[0] == 0


def test_nucleus_truncates_tail():
    probs = jnp.asarray([[0.5, 0.3, 0.15, 0.05]])
    # threshold 0.6: keep {0} (cum .5), token 1 pushes cum to .8 > .6
    seen = {int(np.asarray(nucleus_sample(probs, 0.6, jax.random.PRNGKey(s)))[0])
            for s in range(20)}
    assert seen == {0}


# ---------------------------------------------------------------------------
# Beam search
# ---------------------------------------------------------------------------

def test_beam_search_shapes_and_scores():
    model, params, img = _model_and_inputs()
    gen = BeamSearchTokenGenerator(model, beam_width=3, temperature=1.0,
                                   top_k=16, max_new_tokens=6,
                                   beam_expansion_factor=4, eos_token_id=None)
    prompt = jnp.asarray([[1, 2], [3, 4]])
    ids, scores = gen(params, img, prompt, rng=jax.random.PRNGKey(0))
    # total length = max_new_tokens + t0 - 1 (reference :46-47)
    assert ids.shape == (2, 3, 6 + 2 - 1)
    assert scores.shape == (2, 3)
    assert np.isfinite(np.asarray(scores)).all()
    np.testing.assert_array_equal(np.asarray(ids[:, 0, :2]), np.asarray(prompt))


def test_beam_search_greedy_sorted():
    """temperature<=0 + consolidation_temperature<=0 → deterministic,
    score-sorted beams."""
    model, params, img = _model_and_inputs()
    gen = BeamSearchTokenGenerator(model, beam_width=3, temperature=0.0,
                                   max_new_tokens=5, beam_expansion_factor=4,
                                   consolidation_temperature=0.0)
    prompt = jnp.asarray([[1], [2]])
    ids, scores = gen(params, img, prompt)
    s = np.asarray(scores)
    assert (np.diff(s, axis=-1) <= 1e-5).all()  # sorted desc per sample
    ids2, scores2 = gen(params, img, prompt)
    np.testing.assert_array_equal(np.asarray(ids), np.asarray(ids2))


def test_beam_search_sticky_eos():
    """Once a beam emits EOS it keeps emitting EOS with 0 added score when
    continuations score below -length_boost (reference :80-90).  With a huge
    negative top-1... instead force EOS via an eos-only vocab path: use
    greedy with eos_token_id equal to the argmax so all beams finish
    immediately and the loop early-exits."""
    model, params, img = _model_and_inputs()
    prompt = jnp.asarray([[1], [2]])
    # find the greedy first token, then declare it EOS
    out = model.generate(params, img, prompt, max_new_tokens=1,
                         temperature=0.0)
    eos = int(np.asarray(out)[0, -1])
    gen = BeamSearchTokenGenerator(model, beam_width=2, temperature=0.0,
                                   max_new_tokens=8, beam_expansion_factor=2,
                                   consolidation_temperature=0.0,
                                   eos_token_id=eos, length_boost=1.0)
    ids, scores = gen(params, img, prompt)
    arr = np.asarray(ids)
    # the sticky property: in EVERY beam that emitted eos, everything after
    # the first eos is eos (a finished beam only ever re-emits eos); at
    # least one sample-0 beam must have finished (its greedy top-1 IS eos)
    finished = 0
    for s_ in range(arr.shape[0]):
        for b_ in range(arr.shape[1]):
            row = arr[s_, b_]
            if (row == eos).any():
                eos_pos = int(np.argmax(row == eos))
                assert (row[eos_pos:] == eos).all(), (s_, b_, row)
                finished += 1
    assert finished >= 1, arr


def test_beam_search_cached_equals_fallback():
    """The KV-cached beam loop must match the full-reforward loop in greedy
    mode (identical candidate sets and scores)."""
    model, params, img = _model_and_inputs()
    gen = BeamSearchTokenGenerator(model, beam_width=2, temperature=0.0,
                                   max_new_tokens=5, beam_expansion_factor=3,
                                   consolidation_temperature=0.0)
    prompt = jnp.asarray([[1, 2], [3, 4]])
    ids_fast, sc_fast = gen(params, img, prompt)
    cls = model.decoder.__class__
    orig = cls.supports_kv_cache
    try:
        cls.supports_kv_cache = property(lambda self: False)
        ids_slow, sc_slow = gen(params, img, prompt)
    finally:
        cls.supports_kv_cache = orig
    np.testing.assert_array_equal(np.asarray(ids_fast), np.asarray(ids_slow))
    np.testing.assert_allclose(np.asarray(sc_fast), np.asarray(sc_slow),
                               atol=1e-4)


def test_chunked_top_k_exact():
    """chunked_top_k returns lax.top_k's exact values/behaviour on a
    larger-than-chunk vocab (incl. non-divisible sizes and ties)."""
    from image2text_tpu.models.sampling import chunked_top_k

    rng = np.random.default_rng(0)
    for v in (50258, 4096, 777):
        logits = jnp.asarray(rng.standard_normal((5, v)), jnp.float32)
        vals, idx = chunked_top_k(logits, 16, chunk=2048)
        ref_vals, _ = jax.lax.top_k(logits, 16)
        np.testing.assert_array_equal(np.asarray(vals), np.asarray(ref_vals))
        # indices point at the values they claim
        np.testing.assert_array_equal(
            np.take_along_axis(np.asarray(logits), np.asarray(idx), axis=-1),
            np.asarray(vals))


def test_gathered_top_k_exact():
    """gathered_top_k (threshold-gather) returns lax.top_k's exact values
    on random rows, non-divisible vocabs, ties, and rows whose entire
    top-k sits inside a single chunk."""
    from image2text_tpu.models.sampling import gathered_top_k

    rng = np.random.default_rng(2)
    for v in (50258, 50304, 777):
        for k in (1, 16, 48):
            logits = jnp.asarray(rng.standard_normal((5, v)), jnp.float32)
            vals, idx = gathered_top_k(logits, k)
            ref_vals, ref_idx = jax.lax.top_k(logits, k)
            np.testing.assert_array_equal(np.asarray(vals),
                                          np.asarray(ref_vals))
            # continuous draws: indices are a.s. distinct -> exact too
            np.testing.assert_array_equal(np.asarray(idx),
                                          np.asarray(ref_idx))
    # whole top-k concentrated in one chunk (block-max selection must not
    # assume one winner per block)
    logits = jnp.zeros((2, 50258), jnp.float32)
    logits = logits.at[:, 100:148].set(jnp.arange(48, dtype=jnp.float32))
    vals, idx = gathered_top_k(logits, 8)
    np.testing.assert_array_equal(np.asarray(vals),
                                  np.asarray(jax.lax.top_k(logits, 8)[0]))
    np.testing.assert_array_equal(
        np.take_along_axis(np.asarray(logits), np.asarray(idx), axis=-1),
        np.asarray(vals))
    # ties across chunks: VALUES must still be exact
    tied = jnp.zeros((1, 50258), jnp.float32).at[0, ::1000].set(5.0)
    vals, idx = gathered_top_k(tied, 16)
    np.testing.assert_array_equal(np.asarray(vals), np.full((1, 16), 5.0))
    assert len(set(np.asarray(idx)[0].tolist())) == 16
    # k >= number of blocks -> full-row fallback
    small = jnp.asarray(rng.standard_normal((3, 700)), jnp.float32)
    vals, idx = gathered_top_k(small, 5, chunk=256)
    np.testing.assert_array_equal(np.asarray(vals),
                                  np.asarray(jax.lax.top_k(small, 5)[0]))
    # -inf inputs (beam sticky-EOS rows, banned tokens): the one-hot
    # gather's clamp must not leak NaNs (0 * -inf) and must restore -inf
    allneg = jnp.full((3, 50258), -np.inf, jnp.float32)
    allneg = allneg.at[:, 7].set(1.0).at[:, 9000].set(0.5)
    vals, idx = gathered_top_k(allneg, 16)
    a = np.asarray(vals)
    assert a[0, 0] == 1.0 and a[0, 1] == 0.5
    assert np.all(np.isneginf(a[:, 2:])) and not np.any(np.isnan(a))
    mixed = jnp.asarray(rng.standard_normal((4, 50258)), jnp.float32)
    mixed = mixed.at[:, ::97].set(-np.inf)
    vals, idx = gathered_top_k(mixed, 48)
    ref_vals, ref_idx = jax.lax.top_k(mixed, 48)
    np.testing.assert_array_equal(np.asarray(vals), np.asarray(ref_vals))
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(ref_idx))
    # the dynamic-gather variant stays exact too (probe baseline)
    x = jnp.asarray(rng.standard_normal((5, 50258)), jnp.float32)
    vals, idx = gathered_top_k(x, 48, onehot_gather=False)
    ref_vals, ref_idx = jax.lax.top_k(x, 48)
    np.testing.assert_array_equal(np.asarray(vals), np.asarray(ref_vals))
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(ref_idx))


def test_sample_logits_topk_distribution():
    """The fast top-k sampling path only emits top-k ids, with frequencies
    matching the softmax over the kept logits."""
    from image2text_tpu.models.sampling import sample_logits

    rng = np.random.default_rng(1)
    logits = jnp.asarray(rng.standard_normal((2000, 512)) * 2, jnp.float32)
    ids = np.asarray(sample_logits(logits, jax.random.PRNGKey(0),
                                   temperature=1.0, top_k=4))
    ref_vals, ref_idx = jax.lax.top_k(logits, 4)
    ok = (ids[:, None] == np.asarray(ref_idx)).any(axis=-1)
    assert ok.all()
    # the argmax token should be the most frequent choice overall
    p = jax.nn.softmax(ref_vals, axis=-1)
    assert abs(float(np.mean(ids == np.asarray(ref_idx)[:, 0]))
               - float(np.mean(p[:, 0]))) < 0.05


def test_nucleus_large_vocab_fast_path_exact():
    """On a >top_cap vocab, the chunked nucleus path must keep the same
    token set as the full sort (same kept mask -> same distribution), and
    the exactness gate must route flat distributions to the full sort."""
    from image2text_tpu.models.sampling import nucleus_sample

    rng = np.random.default_rng(0)
    # peaked distribution: the nucleus easily sits inside the top-64
    logits = jnp.asarray(rng.standard_normal((8, 50258)) * 4, jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)
    ids_fast = np.asarray(nucleus_sample(probs, 0.6, jax.random.PRNGKey(0),
                                         top_cap=4096))
    # the sampled token must be inside the true nucleus of each row
    s = np.asarray(probs)
    order = np.argsort(-s, axis=-1)
    for r in range(8):
        srt = s[r, order[r]]
        cum = np.cumsum(srt)
        thr = max(0.6, srt[0])
        kept = order[r][cum <= thr]
        assert ids_fast[r] in kept

    # near-uniform distribution with p=0.999: top-4096 of 50258 cannot
    # cover the threshold -> gate must take the exact full-sort branch
    flat = jnp.full((2, 50258), 1.0 / 50258, jnp.float32)
    ids_flat = np.asarray(nucleus_sample(flat, 0.999, jax.random.PRNGKey(1),
                                         top_cap=4096))
    assert ids_flat.shape == (2,)
    assert (ids_flat >= 0).all() and (ids_flat < 50258).all()


def test_apply_ngram_equals_dense_bias():
    """The scatter-apply path (what the decode loops run) must equal
    logits + dense bias for every cur_len and random id pattern."""
    from image2text_tpu.models.sampling import (
        apply_no_repeat_ngram,
        no_repeat_ngram_bias,
    )

    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, 9, (3, 12)))
    logits = jnp.asarray(rng.standard_normal((3, 10)), jnp.float32)
    for sizes in [(2, 3), (1,), (1, 2, 4), ()]:
        for cur in range(1, 12):
            dense = np.asarray(
                logits + no_repeat_ngram_bias(ids, jnp.asarray(cur), 10,
                                              sizes))
            fused = np.asarray(
                apply_no_repeat_ngram(logits, ids, jnp.asarray(cur), sizes))
            np.testing.assert_array_equal(fused, dense, err_msg=f"{sizes}@{cur}")


def test_sample_logits_topk_fast_path_in_topk_set():
    """The top-k-only fast path must sample inside the top-k set and hit
    every top-k member with roughly softmax frequency."""
    from image2text_tpu.models.sampling import sample_logits

    rng = np.random.default_rng(1)
    logits = jnp.asarray(rng.standard_normal((4, 5000)), jnp.float32)
    ref_idx = np.asarray(jax.lax.top_k(logits, 8)[1])
    draws = np.stack([np.asarray(sample_logits(
        logits, jax.random.PRNGKey(s), temperature=1.0, top_k=8))
        for s in range(64)])                     # (64, 4)
    for b in range(4):
        assert set(draws[:, b]) <= set(ref_idx[b]), (b, set(draws[:, b]))


def test_ngram_bias_mixed_sizes_batched():
    """Regression: n=1 mixed with n>=2 at batch > 1 (the single-scatter
    rewrite must broadcast the unigram penalty to the full batch)."""
    from image2text_tpu.models.sampling import no_repeat_ngram_bias

    ids = jnp.asarray([[3, 4, 3, 0], [5, 6, 7, 0]])
    bias = np.asarray(no_repeat_ngram_bias(ids, jnp.asarray(3), 10, (1, 2)))
    assert bias.shape == (2, 10)
    # unigram rule: every seen token banned, per row
    assert bias[0, 3] == -np.inf and bias[0, 4] == -np.inf
    assert bias[1, 5] == -np.inf and bias[1, 6] == -np.inf and \
        bias[1, 7] == -np.inf
    assert bias[0, 5] == 0 and bias[1, 3] == 0


def test_chunked_top_k_huge_k_falls_back():
    """Regression: k > chunk must fall back to the full sort, not assert."""
    from image2text_tpu.models.sampling import chunked_top_k

    logits = jnp.asarray(np.random.default_rng(0).standard_normal((2, 5000)),
                         jnp.float32)
    vals, idx = chunked_top_k(logits, 4096, chunk=2048)
    ref_vals, _ = jax.lax.top_k(logits, 4096)
    np.testing.assert_array_equal(np.asarray(vals), np.asarray(ref_vals))


def test_generate_under_tp_mesh_matches_single_device():
    """KV-cached generation with params sharded over a dp4xtp2 mesh must
    emit the same tokens as the unsharded run (TP is annotation-only; XLA
    collectives must not change the sampled sequence)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from image2text_tpu.parallel.sharding_rules import place_params

    model, params, img = _model_and_inputs(b=4, seed=3,
                                           use_cross_attn=True)
    prompt = jnp.ones((4, 1), jnp.int32)
    ref = np.asarray(model.generate(params, img, prompt, max_new_tokens=6,
                                    temperature=0.7, top_k=8,
                                    rng=jax.random.PRNGKey(5)))

    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(4, 2),
                ("data", "model"))
    sharded = place_params(params, mesh)
    data_sh = NamedSharding(mesh, P("data"))
    img_s = jax.device_put(img, data_sh)
    prompt_s = jax.device_put(prompt, data_sh)
    out = np.asarray(model.generate(sharded, img_s, prompt_s,
                                    max_new_tokens=6, temperature=0.7,
                                    top_k=8, rng=jax.random.PRNGKey(5)))
    np.testing.assert_array_equal(out, ref)


def test_sparse_fallback_rule_at_current_length():
    """The fixed-buffer re-forward fallback must match a TRUE
    growing-length loop (the reference's shape of generation) through the
    window where a sparse layer's selected-count crosses 2 — the global
    bypass rule has to be evaluated at the current length, not the padded
    buffer length."""
    from image2text_tpu.models.generation import EVAL, _sample_step

    # no soft prompt: no always-selected CLS prefix, so the <2-selected
    # regime is reachable; low sparsity puts the 2nd selected position
    # inside the window for at least one layer
    cfg = tiny_config(use_cross_attn=True)
    cfg.use_soft_prompting = False
    dec = cfg.decoder_config
    dec.transformer_config.is_sparse_attn = True
    dec.transformer_config.sparsity_factor = 0.13
    dec.transformer_config.max_block_size = dec.block_size
    model = VisionEncoderDecoder(cfg)
    params = model.init(KEY)

    t0, T = 1, 12
    # the config must actually exercise the crossing regime (else this
    # test is vacuous): cached decode must be inexact for the window
    assert not model.decoder.cache_exact_for_window(t0, t0 + T), \
        "pick a sparsity/seed combo whose selected-count crosses 2 in-window"

    rng = np.random.default_rng(5)
    img = jnp.asarray(rng.standard_normal((2, 3, 64, 64)), jnp.float32)
    prompt = jnp.ones((2, t0), jnp.int32)
    out = np.asarray(model.generate(params, img, prompt, max_new_tokens=T,
                                    temperature=0.0,
                                    rng=jax.random.PRNGKey(0)))

    # reference-shaped growing loop: re-forward ids[:, :cur] each step so
    # the sparse rule sees the true length naturally
    enc = model.encoder(params["encoder"], img, ctx=EVAL)
    ids = prompt
    total = t0 + T
    for _ in range(T):
        o = model(params, images=None, ids=ids, encoder_output=enc,
                  ctx=EVAL)
        buf = jnp.zeros((2, total), jnp.int32)
        buf = buf.at[:, :ids.shape[-1]].set(ids)
        nxt = _sample_step(model, buf, ids.shape[-1], o.logits[:, -1],
                           jax.random.PRNGKey(0), 0.0, None, None)
        ids = jnp.concatenate([ids, nxt[:, None]], axis=-1)
    np.testing.assert_array_equal(out, np.asarray(ids))


def test_beam_search_int8_cross_kv_matches_exact_greedy():
    """Deterministic beam (temp 0, consolidation 0) with int8 cross-KV
    must match the exact path's beams on a decisive model."""
    model, params, img = _model_and_inputs()
    kw = dict(beam_width=2, temperature=0.0, max_new_tokens=5,
              beam_expansion_factor=3, consolidation_temperature=0.0)
    prompt = jnp.asarray([[1], [2]])
    ids, scores = BeamSearchTokenGenerator(model, **kw)(params, img, prompt)
    ids8, scores8 = jax.jit(
        lambda p, im, pr: BeamSearchTokenGenerator(
            model, cross_kv_quant="int8", **kw)(p, im, pr))(
        params, img, prompt)
    assert ids8.shape == ids.shape
    agree = (np.asarray(ids8) == np.asarray(ids)).mean()
    assert agree >= 0.75, f"beam int8 agreement {agree}"
    np.testing.assert_allclose(np.asarray(scores8), np.asarray(scores),
                               rtol=0.1, atol=0.1)


def test_generate_int8_cross_kv_close_to_exact():
    """Serving-mode int8 cross-KV (nn.modules.QuantizedKV): the quantized
    decode must (a) run end-to-end under jit, (b) produce per-step logits
    within int8-rounding tolerance of the exact bf16 path, and (c) agree
    with exact greedy ids on a decisive model (margins >> quant noise)."""
    from image2text_tpu.models.generation import precompute_cross_kv

    model, params, img = _model_and_inputs()
    enc = model.encoder(params["encoder"], img, ctx=EVAL)

    # (b) one cached step, exact vs quantized cross-KV, logits tolerance
    cache = model.decoder.init_cache(2, 12, jnp.float32)
    off = model.space_for_prompt
    ids = jnp.asarray([[1, 2, 3], [4, 5, 6]])
    exact_kv = precompute_cross_kv(model, params, enc)
    int8_kv = precompute_cross_kv(model, params, enc, quant="int8")
    l_exact, _ = decoder_step(model, params, ids, cache, off, enc,
                              cross_kv=exact_kv)
    cache2 = model.decoder.init_cache(2, 12, jnp.float32)
    l_int8, _ = decoder_step(model, params, ids, cache2, off, enc,
                             cross_kv=int8_kv)
    err = np.abs(np.asarray(l_int8) - np.asarray(l_exact))
    scale = np.abs(np.asarray(l_exact)).max()
    assert err.max() < 0.05 * scale, (err.max(), scale)

    # (a)+(c): jitted greedy generate, both modes, token agreement
    prompt = jnp.asarray([[1, 2, 3], [4, 5, 6]])
    g_exact = np.asarray(model.generate(params, img, prompt,
                                        max_new_tokens=8, temperature=0.0))
    g_int8 = np.asarray(jax.jit(lambda p, im, pr: model.generate(
        p, im, pr, max_new_tokens=8, temperature=0.0,
        cross_kv_quant="int8"))(params, img, prompt))
    assert g_int8.shape == g_exact.shape
    agree = (g_int8 == g_exact).mean()
    assert agree >= 0.75, f"greedy agreement {agree} (quant noise too large)"


def test_int8_serving_params_close_to_exact():
    """W8A8 serving mode (models/quantization.int8_serving_params): the
    transformed decoder tree must (a) rewrite the big 2-D weights
    (incl. the tied wte/lm_head) to int8 rows + per-row scales, (b) keep
    forward logits within the two-rounding tolerance of the float path,
    and (c) run a jitted cached generate end-to-end."""
    from image2text_tpu.models.quantization import int8_serving_params

    model, params, img = _model_and_inputs()
    # tiny dims: quantize everything 2-D so the test exercises the form
    dec_q = int8_serving_params(model.decoder, params["decoder"], min_elems=1)
    pq = dict(params)
    pq["decoder"] = dec_q

    wte = dec_q["transformer"]["wte"]
    assert "qweight" in wte and wte["qweight"].dtype == jnp.int8
    assert "weight" not in wte
    # layernorms (1-D weights) stay float
    assert "weight" in dec_q["transformer"]["ln_f"]

    ids = jnp.asarray([[1, 2, 3], [4, 5, 6]])
    out = model(params, img, ids, ctx=EVAL)
    out_q = model(pq, img, ids, ctx=EVAL)
    err = np.abs(np.asarray(out_q.logits) - np.asarray(out.logits))
    scale = np.abs(np.asarray(out.logits)).max()
    assert err.max() < 0.08 * scale, (err.max(), scale)

    prompt = jnp.asarray([[1, 2, 3], [4, 5, 6]])
    g = np.asarray(jax.jit(lambda p, im, pr: model.generate(
        p, im, pr, max_new_tokens=6, temperature=0.0,
        cross_kv_quant="int8"))(pq, img, prompt))
    assert g.shape == (2, 9)
    g_exact = np.asarray(model.generate(params, img, prompt,
                                        max_new_tokens=6, temperature=0.0))
    agree = (g == g_exact).mean()
    assert agree >= 0.6, f"greedy agreement {agree} (quant noise too large)"


def test_beam_search_int8_serving_params():
    """Beam search composes with the FULL int8 serving stack (W8A8 decoder
    weights + int8 cross-KV): shapes hold, scores are finite, and the
    deterministic beam tracks the exact path on a decisive model."""
    from image2text_tpu.models.generation_utils import BeamSearchTokenGenerator
    from image2text_tpu.models.quantization import int8_serving_params

    model, params, img = _model_and_inputs()
    pq = dict(params)
    pq["decoder"] = int8_serving_params(model.decoder, params["decoder"],
                                        min_elems=1)
    gen = BeamSearchTokenGenerator(model, beam_width=2, temperature=0.0,
                                   max_new_tokens=5, beam_expansion_factor=2,
                                   consolidation_temperature=0.0,
                                   cross_kv_quant="int8")
    ids_q, sc_q = gen(pq, img, jnp.asarray([[1], [2]]))
    assert ids_q.shape[:2] == (2, 2) and np.isfinite(np.asarray(sc_q)).all()
    gen_exact = BeamSearchTokenGenerator(model, beam_width=2, temperature=0.0,
                                         max_new_tokens=5,
                                         beam_expansion_factor=2,
                                         consolidation_temperature=0.0)
    ids_e, _ = gen_exact(params, img, jnp.asarray([[1], [2]]))
    agree = (np.asarray(ids_q) == np.asarray(ids_e)).mean()
    assert agree >= 0.5, f"beam int8-serving agreement {agree}"


def test_int8_serving_composes_on_encoder_subtree():
    """The typed W8A8 transform also serves the ENCODER (serving there is
    compute-bound — int8 doubles the MXU rate), skipping non-Linear
    modules (ConvMLP convs, layernorms) by construction."""
    from image2text_tpu.models.quantization import int8_serving_params

    model, params, img = _model_and_inputs()
    pq = dict(params)
    pq["decoder"] = int8_serving_params(model.decoder, params["decoder"],
                                        min_elems=1)
    pq["encoder"] = int8_serving_params(model.encoder, params["encoder"],
                                        min_elems=1)
    prompt = jnp.ones((2, 1), jnp.int32)
    g = np.asarray(jax.jit(lambda p, im, pr: model.generate(
        p, im, pr, max_new_tokens=5, temperature=0.0))(pq, img, prompt))
    assert g.shape == (2, 6)
    g_exact = np.asarray(model.generate(params, img, prompt,
                                        max_new_tokens=5, temperature=0.0))
    assert (g == g_exact).mean() >= 0.5


def test_sample_topk_with_ngram_approx_mode():
    """approx=True (serving mode): bans are still never sampled (banned
    ids are masked inside the candidate head or absent from it), and the
    greedy path ignores the flag entirely (deterministic-exact)."""
    from image2text_tpu.models.sampling import (apply_no_repeat_ngram,
                                                sample_topk_with_ngram)

    rng = np.random.default_rng(13)
    vocab, b, l = 5000, 4, 40
    ns = (1,)  # every seen token banned: strongest ban pressure
    buf = jnp.asarray(rng.integers(0, 50, (b, l)).astype(np.int32))
    cur = jnp.asarray(39)
    logits = np.asarray(rng.standard_normal((b, vocab)), np.float32)
    logits[:, :50] += 10.0  # banned ids dominate the head
    logits = jnp.asarray(logits)
    banned = np.asarray(apply_no_repeat_ngram(logits, buf, cur, ns))
    seen = np.asarray(buf)
    for trial in range(5):
        got = np.asarray(sample_topk_with_ngram(
            logits, buf, cur, ns, jax.random.PRNGKey(trial), 0.7, 16,
            approx=True))
        for r in range(b):
            assert got[r] not in seen[r, :39], "sampled a banned token"
    # greedy: flag is forced off — identical to the exact banned argmax
    got = np.asarray(sample_topk_with_ngram(
        logits, buf, cur, ns, jax.random.PRNGKey(0), 0.0, None, approx=True))
    np.testing.assert_array_equal(got, np.asarray(jnp.argmax(banned, -1)))
