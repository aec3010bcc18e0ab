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
