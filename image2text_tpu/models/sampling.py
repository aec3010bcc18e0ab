"""jit-able logits processing and sampling primitives.

Device-side reformulations of the reference's host-side sampling machinery:

* :func:`no_repeat_ngram_bias` — fixed-shape scan equivalent of HF's
  ``NoRepeatNGramLogitsProcessor`` (reference vision_encoder_decoder.py:40-43,
  153); bans any token that would complete an n-gram already present in the
  sequence, for each configured n.
* :func:`apply_top_k` / :func:`nucleus_sample` / :func:`sample_logits` —
  the reference generate's temperature → ngram → top-k → nucleus →
  multinomial pipeline (vision_encoder_decoder.py:151-178) with identical
  truncation semantics (nucleus keeps the smallest prefix with cumulative
  probability ≤ max(p, p₀), guaranteeing ≥1 token).
* :func:`gumbel_topk_sample` — sampling WITHOUT replacement (beam expansion;
  torch.multinomial(replacement=False) parity, generation_utils.py:78) via
  the Gumbel-top-k trick.

All functions take a fixed-size id buffer plus a current length so shapes
stay static under jit.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

NEG_INF = -jnp.inf


def _ngram_bans(ids_buf: jax.Array, cur_len: jax.Array,
                ngram_sizes: Sequence[int]):
    """(candidates, banned): next-token id candidates (B, M) and which of
    them the n-gram rules actually ban (B, M) bool; M is static.

    For each n, a token x is banned when the last (n-1) tokens followed by
    x already occur as a window ids[j : j+n] with j + n <= cur_len (HF
    semantics: windows fully inside the sequence)."""
    b, l = ids_buf.shape
    cand_all = []
    ban_all = []
    for n in ngram_sizes:
        if n < 1 or l < n:
            continue
        if n == 1:
            # every seen token is banned
            seen = jnp.arange(l)[None, :] < cur_len
            cand_all.append(ids_buf)
            ban_all.append(jnp.broadcast_to(seen, ids_buf.shape))
            continue
        # suffix: last n-1 tokens → positions [cur_len-n+1, cur_len-1]
        suf_pos = cur_len - (n - 1) + jnp.arange(n - 1)          # (n-1,)
        suffix = jnp.take_along_axis(
            ids_buf, jnp.broadcast_to(suf_pos[None, :], (b, n - 1)), axis=1)
        # windows: for each start j, ids[j : j+n-1] vs suffix
        j = jnp.arange(l)[:, None]                               # (L, 1)
        i = jnp.arange(n - 1)[None, :]                           # (1, n-1)
        win_pos = jnp.minimum(j + i, l - 1)                      # (L, n-1)
        windows = ids_buf[:, win_pos]                            # (B, L, n-1)
        match = jnp.all(windows == suffix[:, None, :], axis=-1)  # (B, L)
        valid = (jnp.arange(l) + n) <= cur_len                   # j + n <= cur
        # HF only bans once the suffix itself exists (cur_len >= n-1 ... and
        # a full window fits: cur_len >= n)
        match = match & valid[None, :] & (cur_len >= n)
        cand_all.append(
            ids_buf[:, jnp.minimum(jnp.arange(l) + (n - 1), l - 1)])  # (B, L)
        ban_all.append(match)
    if not cand_all:
        return None, None
    return (jnp.concatenate(cand_all, axis=-1),
            jnp.concatenate(ban_all, axis=-1))


def apply_no_repeat_ngram(logits: jax.Array, ids_buf: jax.Array,
                          cur_len: jax.Array,
                          ngram_sizes: Sequence[int]) -> jax.Array:
    """Set banned tokens' logits to -inf — ONE scatter-min straight into
    the logits.  Equivalent to ``logits + no_repeat_ngram_bias(...)`` (an
    additive -inf IS a set to -inf) without materialising and re-reading a
    dense (B, V) fp32 bias: at serving batch sizes the bias round-trip is
    ~150 MB of HBM traffic per decode step."""
    cand, ban = _ngram_bans(ids_buf, cur_len, ngram_sizes)
    if cand is None:
        return logits
    b = logits.shape[0]
    v = logits.shape[-1]
    # un-banned candidates scatter out of bounds and are dropped
    idx = jnp.where(ban, cand, v)
    return logits.at[jnp.arange(b)[:, None], idx].min(NEG_INF, mode="drop")


def no_repeat_ngram_bias(ids_buf: jax.Array, cur_len: jax.Array,
                         vocab_size: int,
                         ngram_sizes: Sequence[int]) -> jax.Array:
    """Additive bias (B, V): -inf on tokens banned by the n-gram rules.

    Dense form of :func:`apply_no_repeat_ngram` (which the decode loops
    use — it skips this array's round-trip); kept for callers that need
    the bias itself."""
    b, l = ids_buf.shape
    bias = jnp.zeros((b, vocab_size), jnp.float32)
    cand, ban = _ngram_bans(ids_buf, cur_len, ngram_sizes)
    if cand is None:
        return bias
    pen = jnp.where(ban, NEG_INF, 0.0)
    return bias.at[jnp.arange(b)[:, None], cand].min(pen)


SMALL_K_FULLROW = 64
GATHER_CHUNK = 128


def gathered_top_k(logits: jax.Array, k: int,
                   chunk: int = GATHER_CHUNK,
                   onehot_gather: bool = True) -> Tuple[jax.Array,
                                                        jax.Array]:
    """Exact small-k top-k via threshold-gather: sort a ~k·chunk-wide row
    instead of the full vocab.

    The top-k values of a row live in at most k of its ``chunk``-wide
    blocks, and any block containing one of them has a block-max >= that
    value — so the k blocks with the largest maxes are guaranteed to
    cover the true top-k (if a top-k element x sat outside them, k
    selected blocks would each hold an element > x, contradicting x's
    rank).  One cheap VPU max-reduce over the row, a tiny top-k over the
    block maxes, a (k, chunk) gather, and the expensive sort runs on
    k·chunk elements instead of V.  Top-k VALUES are exact; index
    tie-breaks at equal values may differ from ``lax.top_k``'s
    lowest-index rule (same caveat as the chunked formulation).

    Runs in the logits' own dtype end to end: every term is a gather or a
    max of existing values, so a bf16 input gives the exact same selection
    a pre-upcast f32 run would (f32(x) of a bf16 x is exact, comparisons
    and ties are identical) at HALF the full-vocab HBM traffic — the
    (B, V) passes dominate the decode-loop sampler at serving batch
    (PROBE_TOPK.jsonl).

    Returns (values, indices), both (..., k), values descending.
    """
    v = logits.shape[-1]
    lead = logits.shape[:-1]
    c = -(-v // chunk)
    if k >= c:  # selecting every block == the full row
        return jax.lax.top_k(logits, k)
    pad = c * chunk - v
    if pad:
        logits = jnp.pad(logits, [(0, 0)] * len(lead) + [(0, pad)],
                         constant_values=NEG_INF)
    blocks = logits.reshape(*lead, c, chunk)
    _, bidx = jax.lax.top_k(jnp.max(blocks, axis=-1), k)       # (..., k)
    if onehot_gather:
        # XLA lowers the per-row dynamic block gather row-granularly
        # (~1 ms at (256, 50304) — the formulation's dominant term); a
        # one-hot f32 matmul is exact (each output row is 1.0·block +
        # 0.0·rest; adding exact zeros is exact) and runs on the MXU.
        # -inf inputs (banned tokens, zero-prob gumbel rows) would turn
        # the zero terms into 0·-inf = NaN, so they are clamped for the
        # dot and restored after — only rows with fewer than k finite
        # entries even see the difference, and they get the same -inf
        # values back (index tie-breaks may differ).  The clamp must be
        # bf16-REPRESENTABLE: the TPU MXU computes f32 dots via bf16
        # decomposition, and float32.min (-3.4028e38) rounds to -inf in
        # bf16 (max finite 3.3895e38), recreating the 0·-inf = NaN this
        # clamp exists to prevent (observed on v5e).
        # precision=HIGHEST: the MXU truncates f32 operands to bf16 at
        # default precision (lossy for arbitrary f32 logits); the
        # multi-pass decomposition reconstructs the full mantissa and is
        # bitwise equal to the dynamic gather (asserted on-chip and by
        # tests/test_generation.py::test_gathered_top_k_exact)
        # dtype-matched clamp (a f32 scalar would promote a bf16 row to
        # f32, re-doubling the pass this formulation exists to halve);
        # -1e38 is finite in bf16 (max finite ~3.39e38)
        fmin = jnp.asarray(-1e38, blocks.dtype)
        oh = jax.nn.one_hot(bidx, c, dtype=blocks.dtype)       # (..., k, C)
        # HIGHEST's multi-pass mantissa reconstruction is only needed for
        # f32 operands (the MXU truncates them to bf16 at default
        # precision); bf16 inputs are selection-exact at DEFAULT — one
        # pass instead of three, and this einsum is the sampler's largest
        # single stage at serving batch (0.42 of 1.70 ms at batch 1024,
        # PROBE_SAMPLER.jsonl round-5 row)
        prec = (jax.lax.Precision.HIGHEST
                if blocks.dtype == jnp.float32 else
                jax.lax.Precision.DEFAULT)
        gathered = jnp.einsum("...kc,...cw->...kw", oh,
                              jnp.maximum(blocks, fmin),
                              precision=prec)
        gathered = jnp.where(gathered <= fmin,
                             jnp.asarray(NEG_INF, gathered.dtype), gathered)
    else:
        gathered = jnp.take_along_axis(blocks, bidx[..., None], axis=-2)
    # Final selection over the (k·chunk)-wide gathered buffer.  The
    # single wide lax.top_k was 73% of the whole sampler at serving
    # batch (PROBE_SAMPLER.jsonl: 3.38 of 4.63 ms at batch 1024), and
    # the batched per-block form lax.top_k((b, k, chunk), k) lowered
    # even worse per element (2.62 ms for 4096 elements/row) — so wide
    # buffers RECURSE through this same threshold-gather with a narrower
    # chunk: every stage is then a cheap max pass, a narrow top-k and a
    # small MXU one-hot gather, bottoming out in a (k·32)-wide sort
    # (0.23 ms at batch 1024).  Values exact (same containment
    # argument); index tie-breaks as above.
    flat = gathered.reshape(*lead, k * chunk)
    if k * chunk > 2048 and chunk > 32:
        vals, fi = gathered_top_k(flat, k, chunk=32,
                                  onehot_gather=onehot_gather)
    else:
        vals, fi = jax.lax.top_k(flat, k)
    sel_block = jnp.take_along_axis(bidx, fi // chunk, axis=-1)
    return vals, sel_block * chunk + fi % chunk


def chunked_top_k(logits: jax.Array, k: int,
                  chunk: int = 2048) -> Tuple[jax.Array, jax.Array]:
    """Exact top-k over a large vocab, TPU-fast.

    Dispatch is probe-derived (tools/topk_probe.py, PROBE_TOPK.jsonl,
    healthy 185-187 TFLOP/s windows, vocab 50258, k=48): small-k
    requests (k <= 64 — serving top-k pulls, beam expansion) go to
    :func:`gathered_top_k` (threshold-gather with the one-hot MXU
    gather, chunk 128: 0.38 / 0.88 / 5.61 ms at batch 128/256/1024 vs
    1.05 / 2.19 / 10.41 for the plain full-row ``jax.lax.top_k`` the
    round-3 sampler rework dispatched to, vs 1.94 / 5.17 / 23.2 for
    the chunked sort round 2 used).  Wider pulls keep the chunked
    formulation (sort 2048-wide chunks, re-select among per-chunk
    winners — identical top-k VALUES, exact as long as k <= chunk)
    until a probe extends the table.

    Returns (values, indices), both (..., k), values descending.
    """
    v = logits.shape[-1]
    if k <= SMALL_K_FULLROW and v > 4 * GATHER_CHUNK:
        return gathered_top_k(logits, k)
    if v <= chunk or k > chunk:
        # k > chunk would break the per-chunk winners invariant; such
        # huge-k requests are rare enough for the plain full sort
        return jax.lax.top_k(logits, k)
    return _chunked_sort_top_k(logits, k, chunk)


def _chunked_sort_top_k(logits: jax.Array, k: int,
                        chunk: int) -> Tuple[jax.Array, jax.Array]:
    """The raw chunked-sort formulation (round 2): sort chunk-wide blocks,
    re-select among per-chunk winners.  Exact values for k <= chunk."""
    v = logits.shape[-1]
    lead = logits.shape[:-1]
    c = -(-v // chunk)
    pad = c * chunk - v
    if pad:
        logits = jnp.pad(logits, [(0, 0)] * len(lead) + [(0, pad)],
                         constant_values=NEG_INF)
    vals, idx = jax.lax.top_k(logits.reshape(*lead, c, chunk), k)
    idx = idx + (jnp.arange(c) * chunk)[:, None]
    vals = vals.reshape(*lead, c * k)
    idx = idx.reshape(*lead, c * k)
    vals, sel = jax.lax.top_k(vals, k)
    return vals, jnp.take_along_axis(idx, sel, axis=-1)


def apply_top_k(logits: jax.Array, top_k: Optional[int]) -> jax.Array:
    """Keep the top-k logits, set the rest to -inf (reference :155-157)."""
    if top_k is None:
        return logits
    k = min(top_k, logits.shape[-1])
    kth = chunked_top_k(logits, k)[0][..., -1:]
    return jnp.where(logits < kth, NEG_INF, logits)


def _nucleus_choose(sorted_probs: jax.Array, rng: jax.Array,
                    nucleus_p: float) -> jax.Array:
    """Choice index into descending-sorted probabilities, reference
    semantics: keep the prefix with cumulative mass ≤ max(p, p₀),
    renormalise, multinomial."""
    cum = jnp.cumsum(sorted_probs, axis=-1)
    threshold = jnp.maximum(nucleus_p, sorted_probs[..., :1])
    keep = cum <= threshold
    trunc = jnp.where(keep, sorted_probs, 0.0)
    logp = jnp.log(jnp.maximum(trunc, 1e-30)) + jnp.where(keep, 0.0, NEG_INF)
    return jax.random.categorical(rng, logp, axis=-1)


def nucleus_sample(probs: jax.Array, nucleus_p: float, rng: jax.Array,
                   top_cap: int = 2048) -> jax.Array:
    """Top-p sample ids from probabilities, reference semantics
    (vision_encoder_decoder.py:160-178): sort desc, keep the prefix with
    cumulative mass ≤ max(p, p₀), renormalise, multinomial.

    Large vocabs avoid the full-row sort: the kept prefix almost always
    lies inside the top ``top_cap`` probabilities (its mass must only
    reach max(p, p₀)), so a chunked partial sort suffices; a
    ``lax.cond`` falls back to the exact full sort for the rare batch
    where the top-``top_cap`` mass does not strictly cover the
    threshold — the fast path is an optimisation, never an
    approximation."""
    v = probs.shape[-1]

    def full(probs):
        sorted_probs, sorted_idx = jax.lax.sort_key_val(
            -probs, jnp.broadcast_to(jnp.arange(v), probs.shape))
        sorted_probs = -sorted_probs
        choice = _nucleus_choose(sorted_probs, rng, nucleus_p)
        return jnp.take_along_axis(sorted_idx, choice[..., None],
                                   axis=-1)[..., 0]

    if v <= top_cap:
        return full(probs)

    vals, idx = chunked_top_k(probs, top_cap, chunk=max(2048, top_cap))
    # exactness gate: positions beyond the cap have cumsum > cum[cap-1];
    # if cum[cap-1] > max(p, p₀) strictly, every kept position is inside
    total = jnp.sum(vals, axis=-1, keepdims=True)
    threshold = jnp.maximum(nucleus_p, vals[..., :1])
    inside = jnp.all(total > threshold)

    def fast(_):
        choice = _nucleus_choose(vals, rng, nucleus_p)
        return jnp.take_along_axis(idx, choice[..., None], axis=-1)[..., 0]

    return jax.lax.cond(inside, fast, lambda _: full(probs), None)


def sample_logits(logits: jax.Array, rng: jax.Array, temperature: float = 1.0,
                  top_k: Optional[int] = None,
                  nucleus_p: Optional[float] = None,
                  approx: bool = False) -> jax.Array:
    """The generate() sampling pipeline on final-step logits (B, V).

    ``approx=True`` (opt-in serving mode, top-k-only path) replaces the
    exact top-k pull with XLA's ApproxTopK PartialReduce at
    recall_target 0.95 — measured 12× faster on v5e (0.16 vs 1.93 ms at
    batch 128, PROBE_TOPK.jsonl).  Borderline tail tokens of the top-k
    may be swapped for near-ties; the argmax (greedy) token is always
    exact by construction of the reduction."""
    if top_k is not None and nucleus_p is None and approx:
        # full-vocab pull in the logits' own dtype (pure selection); the
        # k-wide head upcasts for the temperature/softmax math
        k = min(top_k, logits.shape[-1])
        vals, idx = jax.lax.approx_max_k(logits, k, recall_target=0.95,
                                         aggregate_to_topk=True)
        choice = jax.random.categorical(
            rng, vals.astype(jnp.float32) / temperature, axis=-1)
        return jnp.take_along_axis(idx, choice[..., None], axis=-1)[..., 0]
    if top_k is not None and nucleus_p is None:
        # top-k-only fast path: sample among the k winners directly —
        # softmax over the gathered values IS the top-k-truncated
        # distribution, so this skips the dense re-mask + full-vocab
        # categorical (two more (B, V) fp32 round-trips per decode step).
        # Semantics differ from the reference's threshold mask
        # (vision_encoder_decoder.py:155-157) only on EXACT float ties at
        # the kth value (the mask keeps all tied tokens, top-k keeps
        # exactly k) — measure-zero for continuous logits.  The pull
        # runs in the logits' own dtype; see sample_topk_with_ngram.
        k = min(top_k, logits.shape[-1])
        vals, idx = chunked_top_k(logits, k)
        choice = jax.random.categorical(
            rng, vals.astype(jnp.float32) / temperature, axis=-1)
        return jnp.take_along_axis(idx, choice[..., None], axis=-1)[..., 0]
    logits = logits.astype(jnp.float32) / temperature
    # apply_top_k masks via the chunked kth-value threshold: no full-vocab
    # sort (the round-1 serving bottleneck), and ties at the kth value stay
    # IN the distribution — exactly the reference's `logits < v[:, [-1]]`
    # semantics (vision_encoder_decoder.py:155-157)
    logits = apply_top_k(logits, top_k)
    if nucleus_p is not None:
        probs = jax.nn.softmax(logits, axis=-1)
        return nucleus_sample(probs, nucleus_p, rng)
    return jax.random.categorical(rng, logits, axis=-1)


def sample_topk_with_ngram(logits: jax.Array, ids_buf: jax.Array,
                           cur_len: jax.Array,
                           ngram_sizes: Sequence[int], rng: jax.Array,
                           temperature: float,
                           top_k: Optional[int],
                           approx: bool = False) -> jax.Array:
    """Fused ngram-ban + top-k sampling in ONE full-vocab pass — exact.

    ``apply_no_repeat_ngram``'s scatter-min into the (B, V) logits is the
    decode loop's hidden hog: XLA lowers the row-wise scatter with
    M = len(ngram_sizes)·L index columns near-serially, so its cost grows
    with the id-buffer length L (measured ~3.4 ms/step at batch 256,
    L≈85 on v5e — more than the entire cached decoder step).  Banning
    never *adds* candidates, so the top-k of the banned logits is always
    contained in the top-(k+M) of the raw logits: take top-(k+M) in one
    chunked pass, mark the ≤M banned ids inside that small candidate set
    by direct id comparison, and re-top-k.  Identical distribution to
    ban → temperature → top-k → multinomial (reference
    vision_encoder_decoder.py:151-178); ``temperature <= 0`` returns the
    banned argmax (the greedy path).

    ``approx=True`` (opt-in serving mode): the head pull uses XLA's
    ApproxTopK PartialReduce (recall_target 0.95, 12× faster than the
    exact sort at serving batch — PROBE_TOPK.jsonl); the ban containment
    gate and its fallback still apply, so bans are never dropped — only
    borderline tail membership of the top-k is approximate.

    The full-vocab head pull runs in the logits' OWN dtype (selection of
    existing values — a bf16 input selects exactly what a pre-upcast f32
    run would, see :func:`gathered_top_k`); only the gathered k-wide
    head is upcast to f32 for the temperature/softmax math, which is
    then bit-identical to the old upcast-first pipeline.
    """
    cand, ban = _ngram_bans(ids_buf, cur_len, ngram_sizes)
    greedy = temperature is None or temperature <= 0
    approx = approx and not greedy  # greedy stays deterministic-exact
    if cand is None:
        if greedy:
            return jnp.argmax(logits, axis=-1)
        return sample_logits(logits, rng, temperature, top_k, approx=approx)
    v = logits.shape[-1]
    k = 1 if greedy else min(top_k if top_k is not None else v, v)
    m = cand.shape[-1]
    banned_id = jnp.where(ban, cand, -1)                       # (B, M)

    def pick(kk):
        """top-k of the banned distribution among the top-kk raw logits.

        Exact iff every row has <= kk - k banned ids inside its top-kk
        (then the k unbanned winners all lie within the top-kk).  Returns
        (ok, sampled ids)."""
        if approx:
            vals, idx = jax.lax.approx_max_k(logits, kk, recall_target=0.95,
                                             aggregate_to_topk=True)
        else:
            vals, idx = chunked_top_k(logits, kk, chunk=max(2048, kk))
        hit = jnp.any(idx[..., :, None] == banned_id[..., None, :], axis=-1)
        ok = jnp.all(jnp.sum(hit, axis=-1) <= kk - k)
        vals = jnp.where(hit, jnp.asarray(NEG_INF, vals.dtype), vals)
        if greedy:
            out = jnp.take_along_axis(
                idx, jnp.argmax(vals, axis=-1)[..., None], axis=-1)[..., 0]
            return ok, out
        tv, sel = jax.lax.top_k(vals, k)
        ti = jnp.take_along_axis(idx, sel, axis=-1)
        choice = jax.random.categorical(
            rng, tv.astype(jnp.float32) / temperature, axis=-1)
        return ok, jnp.take_along_axis(ti, choice[..., None], axis=-1)[..., 0]

    kk_full = min(k + m, v)
    # m grows with the id-buffer length (every window is a static ban
    # candidate), and lax.top_k cost grows with k — the full k+m pull is
    # the decode loop's dominant term at large batch (measured 55 ms/step
    # at batch 1024, L=161 vs 4.3 ms for the whole decoder step).  Almost
    # every step has only a handful of REAL bans among the top logits, so
    # pull a small k+margin head and fall back to the exact k+m pull via
    # lax.cond only when some row has more than `margin` banned ids in its
    # head — the fast path is an optimisation, never an approximation.
    # margin 16 (was 32): the pull cost scales with (k+margin)·chunk
    # through the gather and final sorts; >16 distinct ngram bans inside
    # a row's top-(k+16) is rare enough that the exact fallback's
    # amortized cost stays negligible.
    margin = 16
    kk_fast = min(k + margin, kk_full)
    if kk_fast == kk_full:
        return pick(kk_full)[1]
    ok, fast = pick(kk_fast)
    return jax.lax.cond(ok, lambda _: fast, lambda _: pick(kk_full)[1],
                        None)


def beam_candidates_with_ngram(logits: jax.Array, ids_buf: jax.Array,
                               cur_len: jax.Array,
                               ngram_sizes: Sequence[int], rng: jax.Array,
                               temperature: Optional[float],
                               top_k: Optional[int], bef: int):
    """Fused ngram-ban + top-k + bef-candidate selection for stochastic
    beam search (reference generation_utils.py:57-93 semantics), in ONE
    full-vocab pass plus small-head math.

    The dense formulation (apply_no_repeat_ngram's row-wise scatter +
    full-vocab log_softmax + full-vocab Gumbel top-k, every step, on
    bw·bs rows) is the beam loop's dominant cost — the same scatter
    measured ~3.4 ms/step at 256 rows in the sampler before round 4's
    fused path.  Same containment logic as sample_topk_with_ngram: bans
    never add candidates, so the winners live in the top-(k+margin) raw
    head; a lax.cond falls back to the exact top-(k+m) pull when a row
    overflows the margin.

    Returns (next_ids (B, bef), log_scores (B, bef) f32) where
    log_scores are log-softmax values of the banned + top-k-masked
    logits (at ``temperature`` when stochastic) — the truncated,
    renormalised distribution.  Returns None when the configuration
    needs the dense path (stochastic full-vocab sampling: top_k None
    with temperature > 0, or bef > top_k).

    Tie caveat (same as the sampler's fast path): the reference keeps
    ALL values tied at the k-th threshold in the distribution; this
    keeps exactly k — they differ only on exact float ties.
    """
    v = logits.shape[-1]
    greedy = temperature is None or temperature <= 0
    k = min(top_k, v) if top_k is not None else None
    if k is None and not greedy:
        return None
    if k is not None and bef > k:
        return None
    cand, ban = _ngram_bans(ids_buf, cur_len, ngram_sizes)
    m = 0 if cand is None else cand.shape[-1]
    banned_id = None if cand is None else jnp.where(ban, cand, -1)
    if k is None:
        # greedy, no top-k filter: support = all unbanned ids; the exact
        # log-softmax denominator over that set comes from one full lse
        # corrected by the (<= m) banned terms — no scatter needed
        lse_all = jax.scipy.special.logsumexp(
            logits.astype(jnp.float32), axis=-1, keepdims=True)   # (B, 1)
        if banned_id is not None:
            bv = jnp.take_along_axis(logits.astype(jnp.float32),
                                     jnp.maximum(banned_id, 0), axis=-1)
            mass = jnp.sum(jnp.where(ban, jnp.exp(bv - lse_all), 0.0),
                           axis=-1, keepdims=True)
            lse_kept = lse_all + jnp.log1p(-jnp.minimum(mass, 1.0 - 1e-7))
        else:
            lse_kept = lse_all

    def pick(kk):
        vals, idx = chunked_top_k(logits, kk, chunk=max(2048, kk))
        if banned_id is not None:
            hit = jnp.any(idx[..., :, None] == banned_id[..., None, :],
                          axis=-1)
            vals = jnp.where(hit, jnp.asarray(NEG_INF, vals.dtype), vals)
            n_banned = jnp.sum(hit, axis=-1)
        else:
            n_banned = jnp.zeros(vals.shape[:-1], jnp.int32)
        need = k if k is not None else bef
        ok = jnp.all(n_banned <= kk - need)
        if k is None:
            tv, sel = jax.lax.top_k(vals, bef)
            ti = jnp.take_along_axis(idx, sel, axis=-1)
            return ok, ti, tv.astype(jnp.float32) - lse_kept
        tv, sel = jax.lax.top_k(vals, k)
        ti = jnp.take_along_axis(idx, sel, axis=-1)
        logp = jax.nn.log_softmax(
            tv.astype(jnp.float32) / (1.0 if greedy else temperature),
            axis=-1)
        if greedy:
            _, pos = jax.lax.top_k(tv.astype(jnp.float32), bef)
        else:
            g = jax.random.gumbel(rng, logp.shape, jnp.float32)
            _, pos = jax.lax.top_k(logp + g, bef)
        return (ok, jnp.take_along_axis(ti, pos, axis=-1),
                jnp.take_along_axis(logp, pos, axis=-1))

    kk_full = min((k if k is not None else bef) + m, v)
    margin = 16
    kk_fast = min((k if k is not None else bef) + margin, kk_full)
    if kk_fast == kk_full:
        return pick(kk_full)[1:]
    ok, fi, fs = pick(kk_fast)
    return jax.lax.cond(ok, lambda _: (fi, fs),
                        lambda _: pick(kk_full)[1:], None)


def gumbel_topk_sample(log_probs: jax.Array, k: int,
                       rng: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Sample k ids without replacement ∝ exp(log_probs) (Gumbel-top-k).

    Returns (ids, gathered log_probs), both (..., k).
    """
    g = jax.random.gumbel(rng, log_probs.shape, jnp.float32)
    _, ids = chunked_top_k(log_probs + g, k)
    return ids, jnp.take_along_axis(log_probs, ids, axis=-1)
