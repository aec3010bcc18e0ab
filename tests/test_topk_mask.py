"""Bitwise exactness of the Pallas ban+top-k threshold mask kernel.

The kernel (ops/topk_mask.py, interpret mode off-TPU) must equal the jnp
reference formulation — scatter-min bans, k-th-value threshold, ties kept
(reference vision_encoder_decoder.py:151-157 semantics) — bit for bit,
including engineered ties at the threshold, ban-saturated heads, rows with
fewer than k unbanned tokens, and non-tile-aligned shapes.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image2text_tpu.ops.topk_mask import (topk_ban_mask,
                                          topk_ban_mask_reference)


def _random_banned(rng, b, v, m):
    """(b, m) int32 banned ids with a sprinkle of -1 empty slots."""
    ids = rng.integers(0, v, (b, m)).astype(np.int32)
    ids[rng.random((b, m)) < 0.3] = -1
    return jnp.asarray(ids)


@pytest.mark.parametrize("k", [1, 5, 16, 64])
def test_kernel_matches_reference_random(k):
    rng = np.random.default_rng(k)
    b, v, m = 5, 333, 17  # pads rows 5→8 and lanes 333→384
    logits = jnp.asarray(rng.standard_normal((b, v)), jnp.float32)
    banned = _random_banned(rng, b, v, m)
    got = np.asarray(topk_ban_mask(logits, banned, k, use_kernel=True))
    want = np.asarray(topk_ban_mask_reference(logits, banned, k))
    np.testing.assert_array_equal(got, want)


def test_kernel_ties_at_threshold_kept():
    """Duplicated values straddling the k-th position: every tied token
    stays IN (the reference's `logits < kth` keeps ties)."""
    rng = np.random.default_rng(0)
    b, v, k = 4, 260, 8
    base = rng.standard_normal((b, v)).astype(np.float32)
    # plant the value at rank k on 5 extra positions per row
    for r in range(b):
        kth = np.sort(base[r])[-k]
        base[r, rng.permutation(v)[:5]] = kth
    logits = jnp.asarray(base)
    got = np.asarray(topk_ban_mask(logits, None, k, use_kernel=True))
    want = np.asarray(topk_ban_mask_reference(logits, None, k))
    np.testing.assert_array_equal(got, want)
    assert (np.isfinite(got).sum(-1) > k).any(), "case must exercise ties"


def test_kernel_saturated_bans_and_small_rows():
    """Top logits all banned → threshold must come from the unbanned
    remainder; also rows where fewer than k tokens stay unbanned."""
    rng = np.random.default_rng(3)
    b, v, k = 3, 140, 16
    logits = rng.standard_normal((b, v)).astype(np.float32)
    top = np.argsort(logits, axis=-1)[:, -40:]  # ban the 40 best per row
    banned = jnp.asarray(top.astype(np.int32))
    got = np.asarray(topk_ban_mask(jnp.asarray(logits), banned, k,
                                   use_kernel=True))
    want = np.asarray(topk_ban_mask_reference(jnp.asarray(logits), banned, k))
    np.testing.assert_array_equal(got, want)
    # row with only 3 unbanned tokens (< k): kernel keeps exactly those
    wide = jnp.asarray(np.arange(v)[None, :v - 3].astype(np.int32))
    one = jnp.asarray(logits[:1])
    got = np.asarray(topk_ban_mask(one, wide, k, use_kernel=True))
    want = np.asarray(topk_ban_mask_reference(one, wide, k))
    np.testing.assert_array_equal(got, want)
    assert np.isfinite(got).sum() == 3


def test_kernel_k_covers_row_and_negative_rows():
    """k ≥ V keeps everything unbanned; all-negative rows exercise the
    sign level of the key bisection."""
    rng = np.random.default_rng(9)
    logits = jnp.asarray(-np.abs(rng.standard_normal((2, 150))) - 1.0,
                         jnp.float32)
    got = np.asarray(topk_ban_mask(logits, None, 150, use_kernel=True))
    np.testing.assert_array_equal(got, np.asarray(logits))
    got = np.asarray(topk_ban_mask(logits, None, 7, use_kernel=True))
    want = np.asarray(topk_ban_mask_reference(logits, None, 7))
    np.testing.assert_array_equal(got, want)


def test_greedy_over_mask_matches_scatter_argmax():
    """argmax of the masked output == argmax over scatter-banned logits —
    the greedy decode contract."""
    from image2text_tpu.models.sampling import (_ngram_bans,
                                                apply_no_repeat_ngram)

    rng = np.random.default_rng(7)
    vocab, b, l = 3000, 4, 40
    ns = (2, 3)
    buf = jnp.asarray(rng.integers(0, 6, (b, l)).astype(np.int32))
    cur = jnp.asarray(33)
    logits = jnp.asarray(rng.standard_normal((b, vocab)), jnp.float32)
    cand, ban = _ngram_bans(buf, cur, ns)
    banned_id = jnp.where(ban, cand, -1)
    masked = topk_ban_mask(logits, banned_id, 1, use_kernel=True)
    want = jnp.argmax(apply_no_repeat_ngram(logits, buf, cur, ns), axis=-1)
    np.testing.assert_array_equal(np.asarray(jnp.argmax(masked, -1)),
                                  np.asarray(want))


def test_ban_cap_gate_compacts_and_falls_back():
    """M wider than BAN_CAP: few live bans → compacted kernel path; more
    live bans than the cap in some row → exact reference fallback.  Both
    must equal the reference bitwise."""
    from image2text_tpu.ops.topk_mask import BAN_CAP

    rng = np.random.default_rng(21)
    b, v, k = 4, 300, 8
    logits = jnp.asarray(rng.standard_normal((b, v)), jnp.float32)
    m = BAN_CAP + 40
    # case 1: wide M, but only ~10 live bans per row
    ids = np.full((b, m), -1, np.int32)
    for r in range(b):
        ids[r, :10] = rng.permutation(v)[:10]
    got = np.asarray(topk_ban_mask(logits, jnp.asarray(ids), k,
                                   use_kernel=True))
    want = np.asarray(topk_ban_mask_reference(logits, jnp.asarray(ids), k))
    np.testing.assert_array_equal(got, want)
    # case 2: one row saturates the cap → cond falls back, still exact
    ids[1, :] = rng.permutation(v)[:m]
    got = np.asarray(topk_ban_mask(logits, jnp.asarray(ids), k,
                                   use_kernel=True))
    want = np.asarray(topk_ban_mask_reference(logits, jnp.asarray(ids), k))
    np.testing.assert_array_equal(got, want)
