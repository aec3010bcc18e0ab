"""Unit tests for the layer library: shapes, naming parity, numerics."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image2text_tpu.configs.models import (
    MLPConfig,
    MoEConfig,
    SelfAttentionConfig,
    SelfAttentionType,
    TransformerConfig,
)
from image2text_tpu.models.layers import (
    MLP,
    AdvancedPositionalBiasMLP,
    CompositeCosineVectorEmbedding,
    ConvMLP,
    CosineVectorEmbedding,
    LearnableCosineVectorEmbedding,
    MoELinear,
    MultiHeadAttention,
    MultiQueryAttention,
    PeerLookup,
    TransformerBlock,
)
from image2text_tpu.nn.core import Ctx
from image2text_tpu.nn.modules import LayerNorm, Linear
from image2text_tpu.ops.attention import causal_bias, sdpa
from image2text_tpu.ops.functions import normalize_gradients
from image2text_tpu.utils.tree import flatten

KEY = jax.random.PRNGKey(0)


def attn_cfg(attn_type=SelfAttentionType.MULTI_HEAD, n_embd=64, n_head=4):
    return SelfAttentionConfig(
        attn_dropout=0.1, bias=True, dropout=0.1,
        n_head=n_head, n_embd=n_embd, attn_type=attn_type)


def test_linear_naming_and_shape():
    lin = Linear(8, 16)
    p = lin.init(KEY)
    assert p["weight"].shape == (16, 8)
    assert p["bias"].shape == (16,)
    x = jnp.ones((2, 8))
    assert lin(p, x).shape == (2, 16)


def test_linear_matches_torch():
    torch = pytest.importorskip("torch")
    lin = Linear(8, 16)
    p = lin.init(KEY)
    x = np.random.default_rng(0).standard_normal((3, 8)).astype(np.float32)
    ours = np.asarray(lin(p, jnp.asarray(x)))
    theirs = torch.nn.functional.linear(
        torch.tensor(x), torch.tensor(np.asarray(p["weight"])),
        torch.tensor(np.asarray(p["bias"]))).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_layernorm_matches_torch():
    torch = pytest.importorskip("torch")
    ln = LayerNorm(32, bias=True)
    p = ln.init(KEY)
    x = np.random.default_rng(1).standard_normal((4, 32)).astype(np.float32)
    ours = np.asarray(ln(p, jnp.asarray(x)))
    theirs = torch.nn.functional.layer_norm(
        torch.tensor(x), (32,), torch.tensor(np.asarray(p["weight"])),
        torch.tensor(np.asarray(p["bias"])), 1e-5).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_mlp_sequential_naming():
    mlp = MLP(8, 16, gate_sizes=(32, 64), add_residual_connection=True)
    flat = flatten(mlp.init(KEY))
    # torch Sequential indices skip GELU slots: 0, 2, 4
    for k in ["model.0.weight", "model.2.weight", "model.4.weight",
              "residual_connector.weight"]:
        assert k in flat, sorted(flat)
    assert flat["model.0.weight"].shape == (32, 8)
    assert flat["model.2.weight"].shape == (64, 32)
    assert flat["model.4.weight"].shape == (16, 64)
    x = jnp.ones((2, 5, 8))
    assert mlp(mlp.init(KEY), x).shape == (2, 5, 16)


def test_conv_mlp_shapes():
    m = ConvMLP(3, 32, (4, 4), gate_sizes=(8, 16))
    p = m.init(KEY)
    x = jnp.ones((2, 3, 16, 16))
    assert m(p, x).shape == (2, 32, 16, 16)  # 'same' padding keeps H, W


def test_sdpa_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(2)
    q = rng.standard_normal((2, 4, 8, 16)).astype(np.float32)
    k = rng.standard_normal((2, 4, 10, 16)).astype(np.float32)
    v = rng.standard_normal((2, 4, 10, 16)).astype(np.float32)
    mask = np.where(rng.random((2, 1, 8, 10)) > 0.3, 0.0, -np.inf).astype(np.float32)
    # ensure no fully-masked rows
    mask[..., 0] = 0.0
    ours = np.asarray(sdpa(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                           jnp.asarray(mask)))
    theirs = torch.nn.functional.scaled_dot_product_attention(
        torch.tensor(q), torch.tensor(k), torch.tensor(v),
        attn_mask=torch.tensor(mask)).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-4)


def test_sdpa_mqa_broadcast():
    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.standard_normal((2, 4, 8, 16)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((2, 1, 8, 16)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((2, 1, 8, 16)).astype(np.float32))
    assert sdpa(q, k, v).shape == (2, 4, 8, 16)


@pytest.mark.parametrize("h,hk", [(8, 1), (8, 2), (4, 4)])
def test_sdpa_head_fold_matches_explicit_broadcast(h, hk):
    """The shared-KV head fold (which keeps dot_general batch dims matched so
    K/V are never materialised per query head) must be bitwise equal to the
    explicit h-way broadcast, for MQA, GQA, and full-head layouts."""
    rng = np.random.default_rng(7)
    b, s, l, d = 3, 5, 9, 16
    mask = jnp.asarray(
        np.where(rng.random((1, 1, s, l)) > 0.2, 0.0, -np.inf), jnp.float32)
    for dt in (jnp.float32, jnp.bfloat16):
        q = jnp.asarray(rng.standard_normal((b, h, s, d)), dt)
        k = jnp.asarray(rng.standard_normal((b, hk, l, d)), dt)
        v = jnp.asarray(rng.standard_normal((b, hk, l, d)), dt)
        g = h // hk
        kb = jnp.broadcast_to(k[:, :, None], (b, hk, g, l, d)).reshape(b, h, l, d)
        vb = jnp.broadcast_to(v[:, :, None], (b, hk, g, l, d)).reshape(b, h, l, d)
        out = np.asarray(sdpa(q, k, v, mask), np.float32)
        ref = np.asarray(sdpa(q, kb, vb, mask), np.float32)
        np.testing.assert_array_equal(out, ref)


def test_causal_bias():
    cb = np.asarray(causal_bias(4, 4))[0, 0]
    assert cb[0, 0] == 0 and np.isneginf(cb[0, 1]) and cb[3, 0] == 0
    # decode window: s < l aligns last rows
    cb2 = np.asarray(causal_bias(1, 4))[0, 0]
    assert not np.isneginf(cb2).any()


def test_mha_mqa_shapes():
    for cls, ty in [(MultiHeadAttention, SelfAttentionType.MULTI_HEAD),
                    (MultiQueryAttention, SelfAttentionType.MULTI_QUERY)]:
        m = cls(attn_cfg(ty))
        p = m.init(KEY)
        x = jnp.ones((2, 8, 64))
        y = m(p, x, ctx=Ctx(rng=KEY, train=True))
        assert y.shape == (2, 8, 64)
        y_eval = m(p, x)
        assert y_eval.shape == (2, 8, 64)
        assert not np.isnan(np.asarray(y_eval)).any()


def test_moe_linear():
    m = MoELinear(16, 24, proj_features=8, num_experts=4, top_k=2, gate_sizes=(32,))
    p = m.init(KEY)
    flat = flatten(p)
    # experts are stored natively stacked; the checkpoint layer serialises
    # them to the reference's per-expert key names
    assert flat["l1_weight"].shape == (4, 8, 16)
    assert "expert_gates.model.0.weight" in flat
    from image2text_tpu.utils.checkpoint import export_state_dict
    sd = export_state_dict(m, p)
    assert sd["experts.0.l1.weight"].shape == (8, 16)
    assert "experts.3.l2.bias" in sd and "l1_weight" not in sd
    x = jnp.ones((2, 5, 16))
    y = m(p, x)
    assert y.shape == (2, 5, 24)
    assert not np.isnan(np.asarray(y)).any()


def test_moe_matches_reference_semantics():
    """Dense-vectorized dispatch must equal the per-expert loop result."""
    m = MoELinear(16, 12, proj_features=8, num_experts=4, top_k=2)
    p = m.init(KEY)
    x = jnp.asarray(np.random.default_rng(4).standard_normal((6, 16)), jnp.float32)
    y = np.asarray(m(p, x))
    # manual reference computation
    gate = np.asarray(m.expert_gates(p["expert_gates"], x))
    gv = jax.nn.softmax(gate / np.sqrt(16), axis=-1)
    w, i = jax.lax.top_k(gv, 2)
    w, i = np.asarray(w), np.asarray(i)
    l1w, l1b = np.asarray(p["l1_weight"]), np.asarray(p["l1_bias"])
    l2w, l2b = np.asarray(p["l2_weight"]), np.asarray(p["l2_bias"])

    def expert(e, xt):  # reference _MoEUnit: l2(gelu(l1(x)))
        h = xt @ l1w[e].T + l1b[e]
        h = np.asarray(jax.nn.gelu(h, approximate=True))
        return h @ l2w[e].T + l2b[e]

    expected = np.zeros((6, 12), np.float32)
    for t in range(6):
        for j in range(2):
            expected[t] += w[t, j] * expert(int(i[t, j]), x[t])
    np.testing.assert_allclose(y, expected, rtol=2e-4, atol=2e-5)


def test_moe_checkpoint_roundtrip_reference_keys():
    """Reference-style per-expert checkpoints load into the stacked params."""
    import io

    from image2text_tpu.utils.checkpoint import (
        export_state_dict, save_checkpoint, update_params_from_partial_checkpoint)

    m = MoELinear(16, 12, proj_features=8, num_experts=4, top_k=2)
    p = m.init(KEY)
    path = "/tmp/moe_ck_test.npz"
    save_checkpoint(m, p, path)
    p2 = m.init(jax.random.PRNGKey(9))
    p2 = update_params_from_partial_checkpoint(m, p2, path)
    np.testing.assert_array_equal(np.asarray(p2["l1_weight"]),
                                  np.asarray(p["l1_weight"]))
    np.testing.assert_array_equal(np.asarray(p2["l2_bias"]),
                                  np.asarray(p["l2_bias"]))


def test_transformer_block_dense_and_sparse():
    cfg = TransformerConfig(
        rotator_config=MLPConfig(ff_mult=2.0),
        is_causal=True, is_cross_attn=True,
        max_block_size=32, is_sparse_attn=True, sparsity_factor=0.5,
        attn_config=attn_cfg())
    blk = TransformerBlock(cfg, seed=0, n_cls=4)
    p = blk.init(KEY)
    flat = flatten(p)
    for k in ["ln_1.weight", "attn.c_attn.weight", "cross_attn.in_proj_weight",
              "ln_3.weight", "mlp.c_fc.weight", "null_connector.weight",
              "input_mask_idx"]:
        assert k in flat, sorted(flat)
    x = jnp.ones((2, 24, 64))
    enc = jnp.ones((2, 6, 64))
    y = blk(p, x, cross_attn_inputs=enc)
    assert y.shape == (2, 24, 64)
    assert not np.isnan(np.asarray(y)).any()
    # CLS positions always selected and indices sorted (causality)
    idx = np.asarray(flat["input_mask_idx"])
    assert (idx[:4] == np.arange(4)).all()
    assert (np.diff(idx) > 0).all()


def test_transformer_block_moe():
    cfg = TransformerConfig(
        rotator_config=MoEConfig(num_experts=4, proj_features=8,
                                 ff_mult_factor=2.5, top_k=2),
        is_causal=False, is_cross_attn=False,
        attn_config=attn_cfg(SelfAttentionType.MULTI_QUERY))
    blk = TransformerBlock(cfg)
    p = blk.init(KEY)
    y = blk(p, jnp.ones((2, 8, 64)))
    assert y.shape == (2, 8, 64)


def test_normalize_gradients():
    def f(x):
        return jnp.sum(normalize_gradients(x * 3.0) ** 2)
    x = jnp.asarray(np.random.default_rng(5).standard_normal((4, 4)), jnp.float32)
    g = jax.grad(f)(x)
    # backward rescales incoming grad to unit norm, then chain rule (×3)
    assert np.isclose(np.linalg.norm(np.asarray(g)) / 3.0, 1.0, atol=1e-4)


def test_advanced_positional_bias_mlp():
    m = AdvancedPositionalBiasMLP(6, 16, 24, gate_sizes=(8,))
    p = m.init(KEY)
    x = jnp.asarray(np.random.default_rng(6).standard_normal((2, 6, 16)), jnp.float32)
    y = m(p, x)
    assert y.shape == (2, 6, 24)
    # per-position weights must actually differ positionally
    y2 = m(p, x[:, ::-1, :])
    assert not np.allclose(np.asarray(y)[:, ::-1, :], np.asarray(y2))


def test_advanced_positional_matches_loop():
    m = AdvancedPositionalBiasMLP(4, 8, 8, gate_sizes=(16,))
    p = m.init(KEY)
    x = jnp.asarray(np.random.default_rng(7).standard_normal((3, 4, 8)), jnp.float32)
    y = np.asarray(m(p, x))
    # loop over positions applying each position's MLP by hand
    w0, b0 = np.asarray(p["w0"]), np.asarray(p["b0"])
    w2, b2 = np.asarray(p["w2"]), np.asarray(p["b2"])
    for i in range(4):
        h = x[:, i, :] @ w0[i].T + b0[i]
        h = np.asarray(jax.nn.gelu(h, approximate=True))
        yi = h @ w2[i].T + b2[i] + np.asarray(x[:, i, :])  # residual (8==8)
        np.testing.assert_allclose(y[:, i, :], yi, rtol=2e-4, atol=2e-5)


def test_advanced_positional_checkpoint_keys_and_patterns():
    """Serialised keys keep the reference's models.{i}.model.{lid} names and
    the reference YAML optimizer pattern 'encoder*.proj.models.*' still
    selects the stacked params."""
    from image2text_tpu.configs.trainer import OptimizerConfig
    from image2text_tpu.training.optimizer import assign_param_labels
    from image2text_tpu.utils.checkpoint import export_state_dict

    m = AdvancedPositionalBiasMLP(3, 8, 12, gate_sizes=(16,))
    p = m.init(KEY)
    sd = export_state_dict(m, p)
    assert "models.0.model.0.weight" in sd
    assert sd["models.2.model.2.bias"].shape == (12,)
    assert "models.1.residual_connector.weight" in sd  # 8 != 12

    # wrapper-level paths: the leading 'model.' is stripped before matching
    # (reference trainer.py:150-153)
    head = "model.encoder.0.proj"
    specs = {f"{head}.{k}": (f"{head}.{t}", c)
             for k, (t, c) in m.split_specs().items()}
    paths = [f"{head}.{k}" for k in m.split_specs()]
    labels = assign_param_labels(
        paths,
        [OptimizerConfig(lr=1e-3, target_modules=["encoder*.proj.models.*"])],
        split_specs=specs)
    assert all(v == "group_0" for v in labels.values()), labels


def test_peer_lookup():
    m = PeerLookup(32, 24, num_units=64, topk=4, nhead=2)
    p = m.init(KEY)
    x = jnp.asarray(np.random.default_rng(8).standard_normal((2, 5, 32)), jnp.float32)
    y = m(p, x)
    assert y.shape == (2, 5, 24)
    assert not np.isnan(np.asarray(y)).any()


def test_lsh_embeddings():
    m = CosineVectorEmbedding(32, 16, n_proj=8, num_bins=10)
    p = m.init(KEY)
    x = jnp.asarray(np.random.default_rng(9).standard_normal((2, 3, 32)), jnp.float32)
    assert m(p, x).shape == (2, 3, 16)

    lm = LearnableCosineVectorEmbedding(32, 16, n_proj=8, num_bins=10, top_k=3)
    lp = lm.init(KEY)
    assert lm(lp, x).shape == (2, 3, 16)

    cm = CompositeCosineVectorEmbedding(32, 16, (4, 8), n_proj=8, learnable=False)
    cp = cm.init(KEY)
    y = cm(cp, jnp.asarray(np.random.default_rng(10).standard_normal((2, 32)),
                           jnp.float32))
    assert y.shape == (2, 16)


def test_dropout_varies_across_sites():
    cfg = TransformerConfig(
        rotator_config=MLPConfig(ff_mult=2.0), is_causal=True,
        attn_config=attn_cfg())
    blk = TransformerBlock(cfg)
    p = blk.init(KEY)
    x = jnp.ones((2, 8, 64))
    y1 = blk(p, x, ctx=Ctx(rng=jax.random.PRNGKey(1), train=True))
    y2 = blk(p, x, ctx=Ctx(rng=jax.random.PRNGKey(2), train=True))
    assert not np.allclose(np.asarray(y1), np.asarray(y2))
    # deterministic given rng
    y3 = blk(p, x, ctx=Ctx(rng=jax.random.PRNGKey(1), train=True))
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y3))


def test_int8_dot_rows_accuracy():
    """W8A8 helper: s8xs8->s32 dot with per-row scales reconstructs the
    float matmul within the two-rounding error bound."""
    from image2text_tpu.nn.modules import int8_dot_rows, quantize_rows_int8

    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.standard_normal((4, 7, 96)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((32, 96)), jnp.float32)
    qw, qs = quantize_rows_int8(w)
    y = np.asarray(int8_dot_rows(x, qw, qs))
    ref = np.asarray(x @ w.T)
    denom = np.abs(ref).max()
    assert np.abs(y - ref).max() < 0.03 * denom, np.abs(y - ref).max()


def test_embedding_rows_preserves_storage_dtype():
    """The int8 serving gather must return rows in the ORIGINAL storage
    dtype (qdtype marker) — an f32 return would upcast the whole bf16
    decode graph."""
    from image2text_tpu.nn.modules import Embedding
    from image2text_tpu.models.quantization import int8_serving_params

    emb = Embedding(64, 16)
    p = emb.init(KEY)
    p = {"weight": p["weight"].astype(jnp.bfloat16)}

    class Root:
        _children = {"emb": emb}

    pq = int8_serving_params(Root(), {"emb": p}, min_elems=1)["emb"]
    assert pq["qweight"].dtype == jnp.int8
    rows = emb(pq, jnp.asarray([1, 3]))
    assert rows.dtype == jnp.bfloat16
    ref = np.asarray(p["weight"][jnp.asarray([1, 3])], np.float32)
    got = np.asarray(rows, np.float32)
    assert np.abs(got - ref).max() < 0.02 * (np.abs(ref).max() + 1e-9)
