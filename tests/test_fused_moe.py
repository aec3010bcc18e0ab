"""Fused MoE-FFN Pallas kernel vs the XLA composition (interpret mode).

The kernel (ops/fused_moe.py) must reproduce ``_MoEMLP.forward``'s eval
path — gate MLPs, softmax/top-k combine with lax.top_k tie-breaks, both
low-rank expert contractions, GELUs — to accumulation-order rounding.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from image2text_tpu.configs.models import MoEConfig
from image2text_tpu.models.layers import _MoEMLP
from image2text_tpu.nn.core import Ctx
from image2text_tpu.ops.fused_moe import _topk_combine, fused_moe_mlp_compatible


def _mk(bias=True, ff_mult=2.0, n_embd=128):
    cfg = MoEConfig(num_experts=4, proj_features=16, gate_sizes=[32],
                    ff_mult_factor=ff_mult, top_k=2)
    mlp = _MoEMLP(n_embd, bias, 0.1, cfg)
    params = mlp.init(jax.random.PRNGKey(0))
    return mlp, params


@pytest.mark.parametrize("bias", [True, False])
@pytest.mark.parametrize("rows", [256, 300])
def test_fused_matches_xla(bias, rows):
    mlp, params = _mk(bias=bias)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, rows // 2, 128),
                          jnp.float32)
    ref = mlp(params, x, ctx=Ctx(train=False))
    out = fused_moe_mlp_compatible(mlp, params, x, interpret=True)
    assert out is not None
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_fused_bf16_close():
    mlp, params = _mk()
    params = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16)
        if jnp.issubdtype(a.dtype, jnp.floating) else a, params)
    x = jax.random.normal(jax.random.PRNGKey(2), (256, 128), jnp.bfloat16)
    ref = mlp(params, x, ctx=Ctx(train=False))
    out = fused_moe_mlp_compatible(mlp, params, x, interpret=True)
    assert out is not None
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=0.05, atol=0.05)


def test_topk_combine_matches_lax_topk_with_ties():
    gv = jnp.asarray([
        [0.1, 0.4, 0.4, 0.1],   # tie at the top: lowest index wins slot 2
        [0.25, 0.25, 0.25, 0.25],  # full tie: experts 0, 1 selected
        [0.7, 0.1, 0.15, 0.05],
    ], jnp.float32)
    got = _topk_combine(gv, 2)
    top_w, top_i = jax.lax.top_k(gv, 2)
    want = jnp.sum(jax.nn.one_hot(top_i, 4, dtype=top_w.dtype)
                   * top_w[..., None], axis=-2)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_train_ctx_keeps_xla_path():
    """Training must never hit the kernel (no VJP, no dropout): grads of
    the eval-dispatching module must equal the XLA composition's."""
    mlp, params = _mk()
    x = jax.random.normal(jax.random.PRNGKey(3), (8, 128), jnp.float32)

    def loss(params):
        ctx = Ctx(train=True, rng=jax.random.PRNGKey(0))
        return jnp.sum(mlp(params, x, ctx=ctx) ** 2)

    jax.grad(loss)(params)  # must not raise (pallas_call has no VJP)
