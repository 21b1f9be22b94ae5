"""Unit tests for the ops layer: pinv, Nyström-vs-dense equivalence on small
N, masked == unpadded equivalence, modularity vs a naive numpy reference,
greedy pairing vs a naive Python implementation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imp_tpu.ops import (
    MultiheadAttention,
    NystromAttention,
    TransLayer,
    moore_penrose_pinv,
    compute_modularity,
    cosine_similarity_matrix,
    greedy_topk_pairs,
    remove_indices_keep_order,
    masked_attention_pool,
)


def test_moore_penrose_pinv_inverts_well_conditioned():
    rng = np.random.default_rng(0)
    # diagonally-dominant row-stochastic-ish matrix: well conditioned, so the
    # Newton-Schulz iteration must converge to the true inverse
    a = jax.nn.softmax(jnp.asarray(rng.normal(size=(2, 4, 16, 16))), axis=-1)
    a = 0.5 * jnp.eye(16) + 0.5 * a
    inv = moore_penrose_pinv(a, iters=12)
    ident = a @ inv
    eye = jnp.eye(16)
    assert jnp.max(jnp.abs(ident - eye)) < 1e-3


@pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="fused pallas pinv runs on TPU only (validated on hardware by "
    "tools/bench_pinv.py --check; results in BASELINE.md)",
)
def test_pinv_pallas_matches_xla():
    from imp_tpu.ops import attention as att
    from imp_tpu.ops.pinv_kernel import pinv_newton_schulz

    a = jax.nn.softmax(
        jax.random.normal(jax.random.PRNGKey(0), (2, 4, 128, 128)), axis=-1
    )
    old = att.PINV_MODE
    att.PINV_MODE = "xla"
    try:
        zx = att.moore_penrose_pinv(a, 6)
    finally:
        att.PINV_MODE = old
    zp = pinv_newton_schulz(a, 6)
    np.testing.assert_allclose(np.asarray(zp), np.asarray(zx), rtol=2e-4, atol=2e-4)


def test_nystrom_attention_mask_content_invariance():
    """Outputs at valid positions must not depend on the *content* of masked
    (padding) tokens.  (Note: Nyström is not invariant to the padded length
    itself — the landmark grouping changes — which is why the data layer
    always pads to one static length.)"""
    rng = np.random.default_rng(1)
    d, n_real, n_pad = 64, 40, 96
    x_real = jnp.asarray(rng.normal(size=(1, n_real, d)), dtype=jnp.float32)
    mask_pad = jnp.asarray([[True] * n_real + [False] * (n_pad - n_real)])

    x_zeros = jnp.pad(x_real, ((0, 0), (0, n_pad - n_real), (0, 0)))
    garbage = jnp.asarray(rng.normal(size=(1, n_pad - n_real, d)) * 100.0, jnp.float32)
    x_garbage = jnp.concatenate([x_real, garbage], axis=1)

    mod = NystromAttention(dim=d, dim_head=8, heads=8, num_landmarks=8, residual=True)
    params = mod.init(jax.random.PRNGKey(0), x_zeros, mask=mask_pad)
    out_zeros = mod.apply(params, x_zeros, mask=mask_pad)
    out_garbage = mod.apply(params, x_garbage, mask=mask_pad)
    np.testing.assert_allclose(
        np.asarray(out_garbage[:, :n_real]),
        np.asarray(out_zeros[:, :n_real]),
        rtol=1e-4,
        atol=1e-5,
    )


def test_nystrom_attention_exact_when_landmarks_cover_tokens():
    """With one landmark per token (l=1) Nyström reduces to
    A·pinv(A)·A·v = A·v — must match dense attention."""
    from imp_tpu.ops import dense_attention

    rng = np.random.default_rng(8)
    d, n = 64, 32
    x = jnp.asarray(rng.normal(size=(1, n, d)), dtype=jnp.float32)
    mod = NystromAttention(
        dim=d, dim_head=8, heads=8, num_landmarks=n, pinv_iterations=12, residual=False
    )
    params = mod.init(jax.random.PRNGKey(0), x)
    out = mod.apply(params, x)

    # manual dense attention with the same projections
    w_qkv = params["params"]["to_qkv"]["kernel"]
    q, k, v = jnp.split(x @ w_qkv, 3, axis=-1)

    def split_heads(t):
        return t.reshape(1, n, 8, 8).transpose(0, 2, 1, 3)

    o, _, _ = dense_attention(split_heads(q), split_heads(k), split_heads(v))
    o = o.transpose(0, 2, 1, 3).reshape(1, n, 64)
    w_out = params["params"]["to_out"]["kernel"]
    b_out = params["params"]["to_out"]["bias"]
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(o @ w_out + b_out), rtol=5e-2, atol=5e-3
    )


def test_nystrom_small_n_fast_path_matches_reference_chain():
    """The l==1 mask-free fast path (one sim + one softmax reused three
    times) must match a manual replication of the reference's general
    three-sim chain on a front-padded short sequence — the UMEML head's
    shape regime (n << num_landmarks)."""
    from imp_tpu.ops.attention import moore_penrose_pinv as pinv

    rng = np.random.default_rng(11)
    d, n, m, h, dh = 64, 7, 32, 8, 8
    x = jnp.asarray(rng.normal(size=(2, n, d)), dtype=jnp.float32)
    mod = NystromAttention(
        dim=d, dim_head=dh, heads=h, num_landmarks=m, residual=False
    )
    params = mod.init(jax.random.PRNGKey(0), x)
    out = mod.apply(params, x)

    # manual general path: front-pad to m, project, three sims, pinv chain
    xp = jnp.pad(x, ((0, 0), (m - n, 0), (0, 0)))
    w_qkv = params["params"]["to_qkv"]["kernel"]
    q, k, v = jnp.split(xp @ w_qkv, 3, axis=-1)

    def split_heads(t):
        return t.reshape(2, m, h, dh).transpose(0, 2, 1, 3)

    q, k, v = split_heads(q), split_heads(k), split_heads(v)
    q = q * (dh**-0.5)
    # l == 1: landmark reduce is identity (sum over singleton / 1.0)
    q_l = q.reshape(2, h, m, 1, dh).sum(axis=3) / 1.0
    k_l = k.reshape(2, h, m, 1, dh).sum(axis=3) / 1.0
    attn1 = jax.nn.softmax(jnp.einsum("bhid,bhjd->bhij", q, k_l), axis=-1)
    attn2 = jax.nn.softmax(jnp.einsum("bhid,bhjd->bhij", q_l, k_l), axis=-1)
    attn3 = jax.nn.softmax(jnp.einsum("bhid,bhjd->bhij", q_l, k), axis=-1)
    o = (attn1 @ pinv(attn2, 6)) @ (attn3 @ v)
    o = o.transpose(0, 2, 1, 3).reshape(2, m, h * dh)
    w_out = params["params"]["to_out"]["kernel"]
    b_out = params["params"]["to_out"]["bias"]
    expect = (o @ w_out + b_out)[:, -n:]
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(expect), rtol=1e-5, atol=1e-6
    )


def test_translayer_shapes_and_mask():
    x = jnp.asarray(np.random.default_rng(2).normal(size=(2, 14, 256)), jnp.float32)
    layer = TransLayer(dim=256)
    params = layer.init(jax.random.PRNGKey(0), x)
    y = layer.apply(params, x)
    assert y.shape == x.shape
    assert np.all(np.isfinite(np.asarray(y)))


def test_mha_raw_weights_and_mask():
    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.normal(size=(2, 5, 32)), jnp.float32)
    kv = jnp.asarray(rng.normal(size=(2, 9, 32)), jnp.float32)
    valid = jnp.asarray([[True] * 9, [True] * 4 + [False] * 5])
    mod = MultiheadAttention(embed_dim=32, num_heads=4)
    params = mod.init(jax.random.PRNGKey(0), q, kv, kv, key_valid=valid)
    out, raw = mod.apply(params, q, kv, kv, key_valid=valid, need_raw=True)
    assert out.shape == (2, 5, 32)
    assert raw.shape == (2, 4, 5, 9)
    # masked keys must carry -max raw score
    assert np.all(np.asarray(raw)[1, :, :, 4:] < -1e30)

    # masked == truncated computation
    out_trunc, _ = mod.apply(params, q[1:], kv[1:, :4], kv[1:, :4])
    np.testing.assert_allclose(
        np.asarray(out[1]), np.asarray(out_trunc[0]), rtol=1e-5, atol=1e-5
    )


def _torch_modularity(c, x, temp=0.1):
    """Naive numpy transcription of the reference math for one slide."""

    def normalize(a, axis):
        n = np.linalg.norm(a, axis=axis, keepdims=True)
        return a / np.maximum(n, 1e-12)

    x = np.asarray(x, np.float64)  # [N, D]
    c = np.asarray(c, np.float64)  # [P, D]
    nx = normalize(x, 1)
    A = np.clip(nx @ nx.T, 0, None)
    A = A - A * np.eye(A.shape[0])
    d = A.sum(1, keepdims=True)
    e = A.sum()
    W = A - (d / e) @ (d.T / e) * e
    nc = c / np.maximum(np.linalg.norm(c, axis=0, keepdims=True), 1e-12)  # over P
    C = np.clip(nx @ nc.T, 0, None)  # [N, P]
    E = np.tanh(np.einsum("np,mp->pnm", C, C) / temp)
    delta = E.max(axis=0)
    Q = (W / e) @ delta
    return -np.trace(Q) * 100.0


def test_modularity_matches_naive_and_mask_invariance():
    rng = np.random.default_rng(4)
    x = rng.normal(size=(1, 12, 16)).astype(np.float32)
    c = rng.normal(size=(1, 3, 16)).astype(np.float32)
    got = float(compute_modularity(jnp.asarray(c), jnp.asarray(x)))
    want = _torch_modularity(c[0], x[0])
    assert got == pytest.approx(want, rel=1e-4)

    # padded + masked equals unpadded
    x_pad = np.concatenate([x, rng.normal(size=(1, 5, 16)).astype(np.float32)], 1)
    valid = jnp.asarray([[True] * 12 + [False] * 5])
    got_masked = float(
        compute_modularity(jnp.asarray(c), jnp.asarray(x_pad), valid=valid)
    )
    assert got_masked == pytest.approx(want, rel=1e-4)


def _dense_modularity(c, x, valid=None, temp=0.1):
    """Dense jnp transcription of the same math (plain AD, no streaming)."""
    import jax

    x = jax.lax.stop_gradient(x)
    nx = x / jnp.maximum(jnp.linalg.norm(x, axis=2, keepdims=True), 1e-12)
    if valid is not None:
        nx = nx * valid[..., None]
    n = x.shape[1]
    A = jnp.clip(jnp.einsum("bnd,bmd->bnm", nx, nx), 0.0, None)
    A = A * (1.0 - jnp.eye(n))
    deg = A.sum(axis=2)
    e = jnp.maximum(deg.sum(axis=1), 1e-12)
    nc = c / jnp.maximum(jnp.linalg.norm(c, axis=1, keepdims=True), 1e-12)
    C = jnp.clip(jnp.einsum("bnd,bpd->bpn", nx, nc), 0.0, None)
    cc = jnp.max(C[:, :, :, None] * C[:, :, None, :], axis=1)
    delta = jnp.tanh(cc / temp)
    s1 = jnp.sum(A * delta, axis=(1, 2))
    q = jnp.einsum("bi,bij,bj->b", deg, delta, deg)
    return -jnp.mean((s1 - q / e) / e) * 100.0


def test_modularity_streamed_gradient_matches_dense_ad():
    """The streaming custom_vjp backward (ops/modularity.py) must agree with
    plain autodiff through the dense formulation."""
    import jax

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(2, 20, 16)).astype(np.float32))
    c = jnp.asarray(rng.normal(size=(2, 3, 16)).astype(np.float32))
    valid = jnp.asarray(np.arange(20)[None, :] < np.array([[14], [20]]))

    got_val = float(compute_modularity(c, x, valid=valid))
    want_val = float(_dense_modularity(c, x, valid=valid))
    assert got_val == pytest.approx(want_val, rel=1e-5)

    g = np.asarray(jax.grad(lambda cj: compute_modularity(cj, x, valid=valid))(c))
    g_dense = np.asarray(jax.grad(lambda cj: _dense_modularity(cj, x, valid=valid))(c))
    np.testing.assert_allclose(g, g_dense, rtol=1e-4, atol=1e-5)


def test_modularity_multiblock_matches_single_block():
    """Values must not depend on the streaming block size (row padding and
    per-block accumulation are exact)."""
    from imp_tpu.ops import modularity as M

    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.normal(size=(2, 50, 8)).astype(np.float32))
    c = jnp.asarray(rng.normal(size=(2, 4, 8)).astype(np.float32))
    got = float(compute_modularity(c, x))
    orig = M._BLOCK
    try:
        M._BLOCK = 16  # forces 4 row blocks with padding (50 -> 64)
        got_blocked = float(compute_modularity(c, x))
    finally:
        M._BLOCK = orig
    assert got_blocked == pytest.approx(got, rel=1e-5)


def test_modularity_pair_matches_two_single_calls():
    """The fused shared-bag variant must equal the sum of single calls, for
    values and gradients."""
    import jax

    from imp_tpu.ops import compute_modularity_pair

    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.normal(size=(2, 30, 16)).astype(np.float32))
    c1 = jnp.asarray(rng.normal(size=(2, 6, 16)).astype(np.float32))
    c2 = jnp.asarray(rng.normal(size=(2, 7, 16)).astype(np.float32))
    valid = jnp.asarray(np.arange(30)[None, :] < np.array([[21], [30]]))

    def pair(c1, c2):
        return compute_modularity_pair((c1, c2), x, valid=valid)

    def singles(c1, c2):
        return compute_modularity(c1, x, valid=valid) + compute_modularity(
            c2, x, valid=valid
        )

    vp, (g1p, g2p) = jax.value_and_grad(pair, argnums=(0, 1))(c1, c2)
    vs, (g1s, g2s) = jax.value_and_grad(singles, argnums=(0, 1))(c1, c2)
    assert float(vp) == pytest.approx(float(vs), rel=1e-5)
    np.testing.assert_allclose(np.asarray(g1p), np.asarray(g1s), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(g2p), np.asarray(g2s), rtol=1e-4, atol=1e-6)


def test_modularity_pallas_backend_matches_scan():
    """The Pallas TPU kernels (run in interpreter mode on CPU) must match the
    scan backend — including masked slides (tile skipping) and multi-set
    fusion."""
    import jax

    from imp_tpu.ops import modularity as M

    rng = np.random.default_rng(10)
    x = jnp.asarray(rng.normal(size=(3, 50, 16)).astype(np.float32))
    c1 = jnp.asarray(rng.normal(size=(3, 3, 16)).astype(np.float32))
    c2 = jnp.asarray(rng.normal(size=(3, 5, 16)).astype(np.float32))
    # slide 0 masked to 18 of 50 tokens -> several fully-masked tiles;
    # slide 2 ALL-masked -> nvb=0 (dead-tile index clamp edge case)
    valid = jnp.asarray(np.arange(50)[None, :] < np.array([[18], [50], [0]]))
    nx = M._l2_normalize(x, axis=2) * valid[..., None]
    Cs = []
    for c in (c1, c2):
        nc = c / jnp.maximum(jnp.linalg.norm(c, axis=1, keepdims=True), 1e-12)
        Cs.append(jax.nn.relu(jnp.einsum("bnd,bpd->bpn", nx, nc)))

    orig = M._BLOCK
    try:
        M._BLOCK = 16
        t_scan, d_scan = M._scan_passes(nx, Cs, 0.1)
        t_pal, d_pal = M._pallas_passes(nx, Cs, 0.1, interpret=True)
    finally:
        M._BLOCK = orig
    for ts, tp in zip(t_scan, t_pal):
        # tile skipping changes the fp summation order slightly
        np.testing.assert_allclose(
            np.asarray(tp), np.asarray(ts), rtol=1e-4, atol=1e-6
        )
    for ds, dp in zip(d_scan, d_pal):
        np.testing.assert_allclose(
            np.asarray(dp), np.asarray(ds), rtol=1e-4, atol=1e-6
        )


def _naive_greedy(sim, k):
    sim = np.asarray(sim).copy()
    order = np.argsort(sim, axis=None)[::-1]
    sel_r, sel_c, pairs = set(), set(), []
    for idx in order:
        i, j = np.unravel_index(idx, sim.shape)
        if i not in sel_r and j not in sel_c:
            pairs.append((i, j))
            sel_r.add(i)
            sel_c.add(j)
        if len(pairs) == k:
            break
    return pairs


def test_greedy_topk_matches_reference_algorithm():
    rng = np.random.default_rng(5)
    sim = rng.normal(size=(3, 7, 7)).astype(np.float32)
    rows, cols = greedy_topk_pairs(jnp.asarray(sim), k=3)
    for b in range(3):
        want = _naive_greedy(sim[b], 3)
        got = list(zip(np.asarray(rows[b]).tolist(), np.asarray(cols[b]).tolist()))
        assert got == want


def test_remove_indices_keep_order():
    tokens = jnp.arange(2 * 7 * 1, dtype=jnp.float32).reshape(2, 7, 1)
    removed = jnp.asarray([[1, 4, 6], [0, 2, 3]])
    kept = remove_indices_keep_order(tokens, removed)
    np.testing.assert_array_equal(
        np.asarray(kept[0, :, 0]), [0, 2, 3, 5]
    )
    np.testing.assert_array_equal(
        np.asarray(kept[1, :, 0]), [7 + 1, 7 + 4, 7 + 5, 7 + 6]
    )


def test_cosine_similarity_matrix():
    rng = np.random.default_rng(6)
    a = rng.normal(size=(2, 4, 8)).astype(np.float32)
    b = rng.normal(size=(2, 5, 8)).astype(np.float32)
    sim = np.asarray(cosine_similarity_matrix(jnp.asarray(a), jnp.asarray(b)))
    for i in range(4):
        for j in range(5):
            want = np.dot(a[0, i], b[0, j]) / (
                np.linalg.norm(a[0, i]) * np.linalg.norm(b[0, j])
            )
            assert sim[0, i, j] == pytest.approx(want, rel=1e-4)


def test_masked_attention_pool():
    rng = np.random.default_rng(7)
    feats = jnp.asarray(rng.normal(size=(2, 6, 8)), jnp.float32)
    scores = jnp.asarray(rng.normal(size=(2, 6, 1)), jnp.float32)
    valid = jnp.asarray([[True] * 6, [True] * 3 + [False] * 3])
    pooled, w = masked_attention_pool(scores, feats, valid)
    assert pooled.shape == (2, 1, 8)
    assert np.asarray(w)[1, 0, 3:].max() < 1e-6
    assert np.asarray(w).sum(-1) == pytest.approx(np.ones((2, 1)), abs=1e-5)
