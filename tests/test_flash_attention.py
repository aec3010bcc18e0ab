"""Flash-attention kernel vs the XLA sdpa reference (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image2text_tpu.ops.attention import causal_bias, sdpa
from image2text_tpu.ops.flash_attention import flash_attention, flash_sdpa


def _rand(shape, seed=0, dtype=jnp.float32):
    return jnp.asarray(np.random.default_rng(seed).standard_normal(shape),
                       dtype)


@pytest.mark.parametrize("b,h,hk,sq,skv,d", [
    (2, 4, 4, 128, 128, 64),     # MHA, exact tiles after d-pad
    (2, 4, 1, 128, 128, 64),     # MQA shared kv head
    (1, 2, 2, 100, 172, 48),     # ragged shapes exercise padding
    (1, 8, 1, 256, 320, 128),    # flagship decode-prefill shape
])
def test_flash_matches_sdpa(b, h, hk, sq, skv, d):
    q = _rand((b, h, sq, d), 0)
    k = _rand((b, hk, skv, d), 1)
    v = _rand((b, hk, skv, d), 2)
    bias = causal_bias(sq, skv)
    ours = flash_attention(q, k, v, bias)
    ref = sdpa(q, k, v, mask=bias, use_flash=False)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("sq,skv", [(128, 128), (100, 172), (64, 256)])
def test_flash_in_kernel_causal(sq, skv):
    """causal=True (in-kernel mask + block skipping) == XLA path with an
    explicit causal bias, including decode-window sq != skv offsets."""
    b, h, d = 2, 2, 64
    q = _rand((b, h, sq, d), 0)
    k = _rand((b, h, skv, d), 1)
    v = _rand((b, h, skv, d), 2)
    ours = flash_attention(q, k, v, None, causal=True)
    ref = sdpa(q, k, v, mask=causal_bias(sq, skv), use_flash=False)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_flash_causal_plus_bias():
    """causal flag composes with an additive (e.g. soft-prompt) bias."""
    b, h, s, d = 1, 2, 64, 32
    q, k, v = _rand((b, h, s, d)), _rand((b, h, s, d), 1), _rand((b, h, s, d), 2)
    bias = np.zeros((1, 1, s, s), np.float32)
    bias[:, :, 8:, :4] = -np.inf
    bias = jnp.asarray(bias)
    ours = flash_attention(q, k, v, bias, causal=True)
    ref = sdpa(q, k, v, mask=bias + causal_bias(s, s), use_flash=False)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_flash_per_batch_bias():
    b, h, s, d = 2, 2, 64, 32
    q, k, v = _rand((b, h, s, d)), _rand((b, 1, s, d), 1), _rand((b, 1, s, d), 2)
    # per-batch soft-prompt-style bias with -inf blocks
    bias = np.zeros((b, 1, s, s), np.float32)
    bias[:, :, 8:, :8] = -np.inf
    bias[0, :, :, 50:] = -np.inf
    bias = jnp.asarray(bias)
    ours = flash_attention(q, k, v, bias)
    ref = sdpa(q, k, v, mask=bias, use_flash=False)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_flash_fully_masked_rows_are_finite():
    """Padding-query rows (all keys masked) must not produce NaN/inf."""
    b, h, s, d = 1, 1, 16, 32
    q, k, v = _rand((b, h, s, d)), _rand((b, h, s, d), 1), _rand((b, h, s, d), 2)
    bias = np.zeros((1, 1, s, s), np.float32)
    bias[:, :, 10:, :] = -np.inf
    out = np.asarray(flash_attention(q, k, v, jnp.asarray(bias)))
    assert np.isfinite(out).all()
    ref = np.asarray(sdpa(q, k, v, mask=jnp.asarray(bias), use_flash=False))
    np.testing.assert_allclose(out[:, :, :10], ref[:, :, :10], atol=2e-5,
                               rtol=2e-5)


def test_flash_bf16():
    b, h, s, d = 1, 2, 128, 64
    q = _rand((b, h, s, d), 0, jnp.bfloat16)
    k = _rand((b, h, s, d), 1, jnp.bfloat16)
    v = _rand((b, h, s, d), 2, jnp.bfloat16)
    bias = causal_bias(s, s)
    ours = np.asarray(flash_attention(q, k, v, bias), np.float32)
    ref = np.asarray(sdpa(q, k, v, mask=bias, use_flash=False), np.float32)
    np.testing.assert_allclose(ours, ref, atol=3e-2, rtol=3e-2)


def test_flash_sdpa_grad_matches_xla():
    """custom_vjp backward (XLA recompute) == grads of the XLA path."""
    b, h, s, d = 1, 2, 64, 32
    q, k, v = _rand((b, h, s, d)), _rand((b, h, s, d), 1), _rand((b, h, s, d), 2)
    bias = causal_bias(s, s)

    def loss_flash(q, k, v):
        return jnp.sum(flash_sdpa(q, k, v, bias, False) ** 2)

    def loss_xla(q, k, v):
        return jnp.sum(sdpa(q, k, v, mask=bias, use_flash=False) ** 2)

    g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-4,
                                   rtol=1e-4)


@pytest.mark.parametrize("hk,causal,sq,skv", [
    (4, True, 128, 128),    # MHA, in-kernel causal
    (1, True, 100, 100),    # MQA (head-summed dk/dv), ragged
    (1, False, 64, 160),    # cross-shaped, bias-only
])
def test_flash_backward_kernels_match_xla(hk, causal, sq, skv):
    """The FA2-style dq/dk/dv kernels must match XLA grads, incl. the MQA
    head reduction and the causal band skipping."""
    b, h, d = 2, 4, 32
    q = _rand((b, h, sq, d), 0)
    k = _rand((b, hk, skv, d), 1)
    v = _rand((b, hk, skv, d), 2)
    bias = None if causal else causal_bias(sq, skv)

    def loss_flash(q, k, v):
        return jnp.sum(flash_sdpa(q, k, v, bias, causal) ** 2)

    def loss_xla(q, k, v):
        m = causal_bias(sq, skv) if causal else bias
        return jnp.sum(sdpa(q, k, v, mask=m, use_flash=False) ** 2)

    g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for name, a, b_ in zip("qkv", g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=2e-4,
                                   rtol=2e-4, err_msg=f"d{name}")


def test_sdpa_grad_finite_with_fully_masked_rows():
    """Regression: padding-query rows (all keys -inf) must yield finite
    grads — a denormal softmax-denominator floor made the division VJP
    compute 0/0=NaN, which polluted shared weight grads via 0·NaN."""
    q = _rand((1, 2, 6, 8), 0)
    k = _rand((1, 2, 6, 8), 1)
    v = _rand((1, 2, 6, 8), 2)
    mask = np.zeros((1, 1, 6, 6), np.float32)
    mask[:, :, 4:, :] = -np.inf
    mask = jnp.asarray(mask)

    def loss(q, k, v):
        return jnp.sum(sdpa(q, k, v, mask=mask, use_flash=False)[:, :, :4] ** 2)

    grads = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    for g in grads:
        assert bool(jnp.isfinite(g).all())

    def loss_flash(q, k, v):
        return jnp.sum(flash_sdpa(q, k, v, mask, False)[:, :, :4] ** 2)

    grads_f = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    for g, gf in zip(grads, grads_f):
        np.testing.assert_allclose(np.asarray(g), np.asarray(gf), atol=1e-5)


def test_sdpa_dispatches_flash():
    """use_flash=True routes through the kernel for eligible shapes and
    matches the XLA path."""
    b, h, s, d = 2, 4, 128, 64
    q, k, v = _rand((b, h, s, d)), _rand((b, h, s, d), 1), _rand((b, h, s, d), 2)
    bias = causal_bias(s, s)
    out_flash = sdpa(q, k, v, mask=bias, use_flash=True)
    out_xla = sdpa(q, k, v, mask=bias, use_flash=False)
    np.testing.assert_allclose(np.asarray(out_flash), np.asarray(out_xla),
                               atol=2e-5, rtol=2e-5)


def test_flash_per_head_bias_batched():
    """Regression: a per-head bias (1, h, sq, skv) with batch > 1 must
    route each head to its own bias plane (it was mis-indexed before),
    including through the backward kernels; also (b, 1) per-batch biases
    with b == h stay distinguishable from per-head ones."""
    from image2text_tpu.ops.attention import sdpa
    from image2text_tpu.ops.flash_attention import flash_sdpa

    rng = np.random.default_rng(0)
    b, h, s, d = 2, 2, 64, 32  # b == h: the ambiguous case
    q = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    for shape in ((1, h, s, s), (b, 1, s, s), (b, h, s, s)):
        bias = jnp.asarray(rng.standard_normal(shape) * 2, jnp.float32)
        ref = sdpa(q, k, v, mask=bias, use_flash=False)
        out = flash_sdpa(q, k, v, bias, False)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5, err_msg=str(shape))

        def loss_flash(q_):
            return jnp.sum(flash_sdpa(q_, k, v, bias, False))

        def loss_ref(q_):
            return jnp.sum(sdpa(q_, k, v, mask=bias, use_flash=False))

        gf = jax.grad(loss_flash)(q)
        gr = jax.grad(loss_ref)(q)
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                   atol=2e-4, rtol=2e-4, err_msg=str(shape))


def test_flash_rejects_partial_row_bias():
    """A bias whose query dim is neither 1 nor sq must fail loudly, not
    silently unmask the remaining rows."""
    from image2text_tpu.ops.flash_attention import flash_sdpa

    q = jnp.zeros((1, 1, 64, 32))
    k = jnp.zeros((1, 1, 128, 32))
    v = jnp.zeros((1, 1, 128, 32))
    bad = jnp.zeros((1, 1, 32, 128))
    with pytest.raises(AssertionError, match="query dim"):
        flash_sdpa(q, k, v, bad, False)


# ---------------------------------------------------------------------------
# in-kernel dropout (training path)
# ---------------------------------------------------------------------------

def _ref_dropout_attention(q, k, v, bias, causal, rate, seed):
    """Pure-jnp reference using the SAME deterministic keep mask the
    kernels regenerate from (coords, seed) — flash must match it exactly
    (up to accumulation order), which pins both the hash and the
    drop-after-softmax semantics."""
    from image2text_tpu.ops.flash_attention import dropout_keep_mask

    b, h, sq, d = q.shape
    skv = k.shape[-2]
    scale = 1.0 / np.sqrt(d)
    kb = jnp.broadcast_to(k, (b, h, skv, d)).astype(jnp.float32)
    scores = jnp.einsum("bhsd,bhld->bhsl", q.astype(jnp.float32),
                        kb) * scale
    if bias is not None:
        scores = scores + bias.astype(jnp.float32)
    if causal:
        scores = scores + causal_bias(sq, skv)
    p = jax.nn.softmax(scores, axis=-1)
    rows = jnp.arange(sq).reshape(1, 1, sq, 1)
    cols = jnp.arange(skv).reshape(1, 1, 1, skv)
    plane = (jnp.arange(b).reshape(b, 1, 1, 1) * h
             + jnp.arange(h).reshape(1, h, 1, 1))
    keep = dropout_keep_mask(rows, cols, plane, seed, rate)
    pd = p * keep / (1.0 - rate)
    vv = v if v.shape[1] == h else jnp.broadcast_to(v, (b, h, skv, d))
    return jnp.einsum("bhsl,bhld->bhsd", pd.astype(q.dtype), vv)


@pytest.mark.parametrize("hk,causal", [(4, False), (1, True)])
def test_flash_dropout_matches_hash_reference(hk, causal):
    b, h, sq, skv, d = 2, 4, 64, 96, 32
    q, k, v = _rand((b, h, sq, d), 0), _rand((b, hk, skv, d), 1), \
        _rand((b, hk, skv, d), 2)
    rate = 0.3
    seed = jnp.asarray(12345, jnp.int32)
    ours = flash_sdpa(q, k, v, None, causal, rate, seed)
    ref = _ref_dropout_attention(q, k, v, None, causal, rate, seed)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               atol=3e-5, rtol=3e-5)
    # determinism: same seed, same mask
    again = flash_sdpa(q, k, v, None, causal, rate, seed)
    np.testing.assert_array_equal(np.asarray(ours), np.asarray(again))
    # different seed, different mask
    other = flash_sdpa(q, k, v, None, causal, rate,
                       jnp.asarray(54321, jnp.int32))
    assert not np.allclose(np.asarray(ours), np.asarray(other))


def test_flash_dropout_grads_match_hash_reference():
    b, h, sq, skv, d = 1, 2, 48, 64, 32
    q, k, v = _rand((b, h, sq, d), 3), _rand((b, h, skv, d), 4), \
        _rand((b, h, skv, d), 5)
    rate = 0.25
    seed = jnp.asarray(777, jnp.int32)
    cot = _rand((b, h, sq, d), 6)

    def loss_flash(q, k, v):
        return jnp.sum(flash_sdpa(q, k, v, None, False, rate, seed) * cot)

    def loss_ref(q, k, v):
        return jnp.sum(
            _ref_dropout_attention(q, k, v, None, False, rate, seed) * cot)

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g_flash, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=2e-4, rtol=2e-4)


def test_flash_dropout_keep_fraction_and_mean():
    """Empirical keep fraction ≈ 1-rate and E[dropout(p)] ≈ p (the
    inverted 1/(1-rate) scaling preserves the mean)."""
    from image2text_tpu.ops.flash_attention import dropout_keep_mask

    rows = jnp.arange(256).reshape(-1, 1)
    cols = jnp.arange(256).reshape(1, -1)
    keep = dropout_keep_mask(rows, cols, jnp.asarray(0), jnp.asarray(99), 0.3)
    frac = float(keep.mean())
    assert abs(frac - 0.7) < 0.02, frac
    # mean preservation through the kernel: average the dropped attention
    # output over many seeds; it must approach the no-dropout output
    b, h, sq, skv, d = 1, 1, 32, 48, 32
    q, k, v = _rand((b, h, sq, d), 20), _rand((b, h, skv, d), 21), \
        _rand((b, h, skv, d), 22)
    base = np.asarray(flash_sdpa(q, k, v, None, False))
    acc = np.zeros_like(base)
    n = 24
    for s in range(n):
        acc += np.asarray(flash_sdpa(q, k, v, None, False, 0.3,
                                     jnp.asarray(1000 + s, jnp.int32)))
    np.testing.assert_allclose(acc / n, base, atol=0.2, rtol=0.25)


def test_sdpa_trains_through_flash_with_dropout():
    """The dispatch path: sdpa(train ctx, dropout>0, use_flash) must run
    the kernel (non-identical to the no-dropout output) and produce
    finite grads."""
    from image2text_tpu.nn.core import Ctx

    b, h, sq, d = 2, 4, 64, 32
    q, k, v = _rand((b, h, sq, d), 7), _rand((b, h, sq, d), 8), \
        _rand((b, h, sq, d), 9)
    ctx = Ctx(rng=jax.random.PRNGKey(0), train=True)
    out = sdpa(q, k, v, dropout_rate=0.4, ctx=ctx, use_flash=True)
    base = sdpa(q, k, v, dropout_rate=0.0, use_flash=True)
    assert not np.allclose(np.asarray(out), np.asarray(base))

    def loss(q):
        return jnp.sum(sdpa(q, k, v, dropout_rate=0.4, ctx=ctx,
                            use_flash=True))

    g = jax.grad(loss)(q)
    assert np.isfinite(np.asarray(g)).all()


def test_flash_dropout_multiblock_fwd_and_grads():
    """Sequence lengths spanning MULTIPLE kernel tiles (fwd 512/1024 vs bwd
    256/512 blocks): the global-coordinate mask reconstruction must agree
    between forward, both backward kernels, and the jnp reference — a
    local-vs-global coordinate bug would silently corrupt gradients at
    flagship training lengths while all single-tile tests pass."""
    b, h, sq, skv, d = 1, 2, 520, 1030, 32
    q, k, v = _rand((b, h, sq, d), 10), _rand((b, h, skv, d), 11), \
        _rand((b, h, skv, d), 12)
    rate = 0.2
    seed = jnp.asarray(31337, jnp.int32)
    ours = flash_sdpa(q, k, v, None, False, rate, seed)
    ref = _ref_dropout_attention(q, k, v, None, False, rate, seed)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               atol=5e-5, rtol=5e-5)
    cot = _rand((b, h, sq, d), 13)
    g_flash = jax.grad(lambda q, k, v: jnp.sum(
        flash_sdpa(q, k, v, None, False, rate, seed) * cot),
        argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(lambda q, k, v: jnp.sum(
        _ref_dropout_attention(q, k, v, None, False, rate, seed) * cot),
        argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g_flash, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=5e-4, rtol=5e-4)


def test_dispatch_gate_short_kv_rows(monkeypatch):
    """Decision-grade dispatch conditions (BENCH_KERNELS.json +
    PROFILE_ENCODER.json): the gate must reject rows with s_kv < 256 even
    when total score work clears 2^25 (the flagship encoder's sparse
    blocks — b256/h8/s160, 52M elements — measured flash 96.8 ms vs XLA
    86.2 ms), and must still dispatch the flagship train shape
    (b48/h8/s320, 39M elements, measured 1.05x flash win)."""
    import image2text_tpu.ops.flash_attention as fa

    sentinel = object()
    monkeypatch.setattr(fa, "flash_sdpa",
                        lambda *a, **kw: sentinel)

    def qkv(b, h, s, d=128):
        z = jnp.zeros((b, h, s, d), jnp.bfloat16)
        return z, z, z

    # encoder sparse-block shape: past the work gate, short kv rows -> XLA
    q, k, v = qkv(256, 8, 160)
    assert fa.flash_attention_compatible(q, k, v, None) is None
    # flagship train shape: both gates pass -> kernel
    q, k, v = qkv(48, 8, 320)
    assert fa.flash_attention_compatible(q, k, v, None) is sentinel
    # single-token decode step: fails the work gate -> XLA
    q, _, _ = qkv(256, 8, 1)
    _, k, v = qkv(256, 1, 320)
    assert fa.flash_attention_compatible(q, k, v, None) is None
