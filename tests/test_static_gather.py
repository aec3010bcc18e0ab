"""Bitwise exactness of the one-hot-matmul static gather/scatter
(ops/static_gather.py) vs the jnp.take / .at[].set formulation it
replaces in the sparse blocks (reference models/layers.py:560-575)."""
import jax.numpy as jnp
import numpy as np
import pytest

from image2text_tpu.ops.static_gather import static_combine, static_take


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_static_take_bitwise(dtype):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((3, 13, 5)), dtype)
    idx = np.asarray([0, 2, 7, 12, 5])
    got = static_take(x, idx)
    want = jnp.take(x, idx, axis=1)
    assert got.dtype == want.dtype
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_static_combine_bitwise(dtype):
    rng = np.random.default_rng(1)
    t = 11
    perm = rng.permutation(t)
    idx, not_idx = np.sort(perm[:7]), np.sort(perm[7:])
    x_sel = jnp.asarray(rng.standard_normal((2, len(idx), 4)), dtype)
    x_not = jnp.asarray(rng.standard_normal((2, len(not_idx), 4)), dtype)
    got = static_combine(x_sel, x_not, idx, not_idx)
    want = jnp.zeros((2, t, 4), dtype)
    want = want.at[:, idx].set(x_sel).at[:, not_idx].set(x_not)
    assert got.shape == want.shape
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_static_combine_empty_bypass():
    rng = np.random.default_rng(2)
    x_sel = jnp.asarray(rng.standard_normal((2, 4, 3)), jnp.float32)
    idx = np.asarray([3, 0, 1, 2])
    got = static_combine(x_sel, x_sel[:, :0], idx, np.asarray([], np.int64))
    want = jnp.zeros((2, 4, 3), jnp.float32).at[:, idx].set(x_sel)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_static_take_int_fallback():
    x = jnp.arange(24, dtype=jnp.int32).reshape(2, 6, 2)
    idx = np.asarray([5, 1])
    np.testing.assert_array_equal(
        np.asarray(static_take(x, idx)), np.asarray(jnp.take(x, idx, axis=1)))


# -- lazy layout threading (TransformerBlock want_lazy path) -----------------

def _sparse_block_chain(n_blocks=3, dense_at=None, t=24, n_cls=4):
    import jax
    from image2text_tpu.configs.models import (MLPConfig, SelfAttentionConfig,
                                               SelfAttentionType,
                                               TransformerConfig)
    from image2text_tpu.models.layers import TransformerBlock

    blocks, params = [], []
    for depth in range(n_blocks):
        sparse = depth != dense_at
        cfg = TransformerConfig(
            rotator_config=MLPConfig(ff_mult=2.0),
            is_causal=True, is_cross_attn=False,
            max_block_size=t if sparse else None,
            is_sparse_attn=sparse, sparsity_factor=0.5,
            attn_config=SelfAttentionConfig(
                attn_dropout=0.0, bias=True, dropout=0.0, n_head=4,
                n_embd=32, attn_type=SelfAttentionType.MULTI_HEAD))
        blk = TransformerBlock(cfg, seed=depth, n_cls=n_cls)
        blocks.append(blk)
        params.append(blk.init(jax.random.PRNGKey(100 + depth)))
    return blocks, params


@pytest.mark.parametrize("dense_at", [None, 1])
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_lazy_layout_chain_bitwise_equals_eager(dense_at, dtype):
    """Threading a lazy layout through a block chain (the encoder/decoder
    loops) must be bitwise identical to reassembling canonical order after
    every block — including a dense block mid-chain, which forces a
    canonicalize."""
    from image2text_tpu.ops.static_gather import canonicalize, layout_rows

    blocks, params = _sparse_block_chain(dense_at=dense_at)
    rng = np.random.default_rng(7)
    x0 = jnp.asarray(rng.standard_normal((2, 24, 32)), dtype)

    x_eager = x0
    for blk, p in zip(blocks, params):
        x_eager = blk(p, x_eager)

    x_lazy, layout = x0, None
    for blk, p in zip(blocks, params):
        new_layout = blk.next_layout(layout, x_lazy.shape[1])
        x_lazy, got_layout = blk(p, x_lazy, layout=layout, want_lazy=True)
        assert (got_layout is None and new_layout is None) or \
            np.array_equal(got_layout, new_layout)
        layout = new_layout

    # the encoder's final CLS pull composes with the layout instead of
    # reassembling the whole stream
    if layout is not None:
        np.testing.assert_array_equal(
            np.asarray(static_take(x_lazy, layout_rows(layout, np.arange(4)))),
            np.asarray(x_eager[:, :4]))
        x_lazy = canonicalize(x_lazy, layout)

    np.testing.assert_array_equal(np.asarray(x_eager), np.asarray(x_lazy))


def test_layout_rows_composition():
    from image2text_tpu.ops.static_gather import layout_rows

    layout = np.asarray([3, 0, 4, 1, 2])
    # row j holds canonical position layout[j]; canonical 0 lives at row 1
    np.testing.assert_array_equal(layout_rows(layout, np.asarray([0, 4])),
                                  np.asarray([1, 2]))
    np.testing.assert_array_equal(layout_rows(None, np.asarray([2, 3])),
                                  np.asarray([2, 3]))
