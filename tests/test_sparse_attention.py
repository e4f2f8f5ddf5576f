"""Value tests for the real sparse-attention architectures (VERDICT
round-1 item 4): BigBird block-sparse, Reformer chunked + LSH, Funnel
pooling. Each pattern is checked against an equivalent dense-mask
formulation computed independently in the test."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from news_recommendation_mind_tpu.models.attention import masked_softmax
from news_recommendation_mind_tpu.models.bert import (
    BertModel, _bigbird_block_pattern, bert_variant, chunked_attention,
    funnel_pool, lsh_attention)


def _dense_reference(q, k, v, mask):
    """Plain masked attention: mask [B,h,S,S] (or broadcastable)."""
    d = q.shape[-1]
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(
        jnp.asarray(d, q.dtype))
    probs = masked_softmax(scores, mask)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v)


def test_bigbird_pattern_structure():
    S, block, n_rand, nh = 512, 64, 3, 4
    pat = _bigbird_block_pattern(S, block, n_rand, nh, seed=0)
    nb = S // block
    assert pat.shape == (nh, nb, nb)
    idx = np.arange(nb)
    win = (np.abs(idx[:, None] - idx[None, :]) <= 1)
    glob = (idx[:, None] == 0) | (idx[None, :] == 0)
    for h in range(nh):
        # window + global always kept
        assert (pat[h] | ~(win | glob)).all()
        # each non-global query block has exactly n_rand random extras
        for qb in range(1, nb):
            extra = pat[h, qb] & ~(win[qb] | glob[qb])
            avail = (~(win[qb] | glob[qb]))[1:].sum()
            assert extra.sum() == min(n_rand, avail), (h, qb)
    # per-head patterns differ; deterministic across calls
    assert any(not np.array_equal(pat[0], pat[h]) for h in range(1, nh))
    np.testing.assert_array_equal(
        pat, _bigbird_block_pattern(S, block, n_rand, nh, seed=0))
    assert not np.array_equal(
        pat, _bigbird_block_pattern(S, block, n_rand, nh, seed=1))


def test_chunked_attention_matches_dense_mask():
    B, h, S, d, c = 2, 3, 50, 8, 8   # S not a chunk multiple on purpose
    rng = np.random.default_rng(0)
    q, k, v = (jnp.asarray(rng.standard_normal((B, h, S, d)), jnp.float32)
               for _ in range(3))
    key_mask = jnp.asarray(
        (rng.random((B, S)) > 0.2).astype(np.float32))
    out = chunked_attention(q, k, v, key_mask[:, None, :], c)

    # dense equivalent: key j visible to query i iff |chunk(i)-chunk(j)|<=1
    ci = np.arange(S) // c
    adj = (np.abs(ci[:, None] - ci[None, :]) <= 1).astype(np.float32)
    mask = adj[None, None] * np.asarray(key_mask)[:, None, None, :]
    ref = _dense_reference(q, k, v, jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_lsh_attention_matches_dense_same_bucket_mask():
    B, h, S, d, c, nb = 2, 2, 64, 16, 8, 8
    rng = np.random.default_rng(1)
    qk = jnp.asarray(rng.standard_normal((B, h, S, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, h, S, d)), jnp.float32)
    key_mask = jnp.asarray(
        (rng.random((B, S)) > 0.15).astype(np.float32))
    out = lsh_attention(qk, v, key_mask[:, None, :], c, nb, seed=5)

    # reproduce the bucketing + sorted-chunk adjacency independently
    rot = np.random.default_rng(5 + 17).standard_normal(
        (d, nb // 2)).astype(np.float32)
    rotated = np.einsum("bhsd,dr->bhsr", np.asarray(qk), rot)
    buckets = np.argmax(np.concatenate([rotated, -rotated], -1), -1)
    km = np.broadcast_to(np.asarray(key_mask)[:, None, :], buckets.shape)
    buckets = np.where(km > 0, buckets, nb)
    pos = np.arange(S)
    ks = np.asarray(qk) / (np.linalg.norm(np.asarray(qk), axis=-1,
                                          keepdims=True) + 1e-6)
    ref = np.zeros_like(np.asarray(v))
    for b in range(B):
        for hh in range(h):
            order = np.argsort(buckets[b, hh] * (S + 1) + pos,
                               kind="stable")
            rank = np.empty(S, np.int64)
            rank[order] = np.arange(S)
            chunk_of = rank // c
            for i in range(S):
                sc = np.full(S, -np.inf, np.float64)
                for j in range(S):
                    if km[b, hh, j] <= 0:
                        continue
                    if abs(chunk_of[i] - chunk_of[j]) > 1:
                        continue
                    if buckets[b, hh, i] != buckets[b, hh, j]:
                        continue
                    s = float(np.asarray(qk)[b, hh, i] @ ks[b, hh, j])
                    s /= np.sqrt(d)
                    if i == j:
                        s -= 1e5
                    sc[j] = s
                if np.isfinite(sc).any():
                    e = np.exp(sc - sc[np.isfinite(sc)].max())
                    e[~np.isfinite(sc)] = 0
                    p = e / e.sum()
                    ref[b, hh, i] = p @ np.asarray(v)[b, hh]
    valid_q = km > 0
    np.testing.assert_allclose(np.asarray(out)[valid_q], ref[valid_q],
                               rtol=2e-4, atol=2e-4)


def test_funnel_pool_values_and_mask():
    B, S, H = 2, 7, 4
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((B, S, H)), jnp.float32)
    mask = jnp.asarray([[1, 1, 1, 1, 1, 0, 0],
                        [1, 1, 1, 1, 0, 0, 0]], jnp.float32)
    px, pm = funnel_pool(x, mask)
    # S=7 -> cls + ceil(6/2)=3 pooled positions
    assert px.shape == (B, 4, H) and pm.shape == (B, 4)
    # CLS passes through
    np.testing.assert_array_equal(np.asarray(px[:, 0]), np.asarray(x[:, 0]))
    # full pair -> mean; half-masked pair -> the valid token alone
    np.testing.assert_allclose(np.asarray(px[0, 1]),
                               np.asarray((x[0, 1] + x[0, 2]) / 2),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(px[1, 2]), np.asarray(x[1, 3]),
                               rtol=1e-6)  # pair (3,4): only 3 valid
    np.testing.assert_array_equal(np.asarray(pm),
                                  [[1, 1, 1, 0], [1, 1, 1, 0]])


@pytest.mark.parametrize("name,S", [("bigbird", 256), ("reformer", 160),
                                    ("funnel", 64)])
def test_variant_forward_and_grads(name, S):
    cfg = bert_variant(name, vocab_size=500).replace(
        hidden_size=32, intermediate_size=64, num_heads=4, num_layers=2,
        chunk_size=16, block_size=32, num_buckets=8)
    model = BertModel(cfg, dtype=jnp.float32)
    rng = np.random.default_rng(3)
    ids = jnp.asarray(rng.integers(0, 500, (2, S)), jnp.int32)
    mask = jnp.ones((2, S), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), ids, mask)
    hidden, pooled = model.apply(params, ids, mask)
    assert pooled.shape == (2, 32)
    if name == "funnel":
        # 3 blocks over 2 layers -> at least one pooling boundary hit
        assert hidden.shape[1] < S

    def loss(p):
        _, pl = model.apply(p, ids, mask)
        return jnp.sum(pl ** 2)

    g = jax.grad(loss)(params)
    assert all(np.isfinite(np.asarray(x)).all()
               for x in jax.tree_util.tree_leaves(g))


def test_reformer_layers_alternate():
    cfg = bert_variant("reformer", vocab_size=100).replace(
        hidden_size=16, intermediate_size=32, num_heads=2, num_layers=4,
        chunk_size=8, num_buckets=4)
    model = BertModel(cfg, dtype=jnp.float32)
    ids = jnp.zeros((1, 32), jnp.int32)
    mask = jnp.ones((1, 32), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), ids, mask)
    layers = params["params"]
    # even layers chunked (separate q/k), odd layers LSH (shared QK)
    assert "query" in layers["layer_0"]["attention"]
    assert "key" in layers["layer_0"]["attention"]
    assert "query_key" in layers["layer_1"]["attention"]
    assert "key" not in layers["layer_1"]["attention"]


def test_full_attention_separate_kv_matches_dense():
    """Funnel pool-query-only substrate: _SelfAttention(full) with a
    separate kv sequence (pooled queries → unpooled keys/values) must
    equal dense cross-attention computed from the extracted projections
    (Funnel-Transformer §2.2)."""
    from news_recommendation_mind_tpu.models.bert import _SelfAttention
    cfg = bert_variant("bert", vocab_size=100).replace(
        hidden_size=16, num_heads=2, attention_dropout=0.0)
    mod = _SelfAttention(cfg.replace(attention_type="full"), jnp.float32)
    B, Sq, Sk, H = 2, 5, 9, 16
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((B, Sq, H)), jnp.float32)
    kv = jnp.asarray(rng.standard_normal((B, Sk, H)), jnp.float32)
    q_mask = jnp.ones((B, Sq), jnp.float32)
    kv_mask = jnp.asarray((rng.random((B, Sk)) > 0.3).astype(np.float32))
    params = mod.init(jax.random.PRNGKey(0), x, q_mask, True,
                      kv=kv, kv_mask=kv_mask)
    out = mod.apply(params, x, q_mask, True, kv=kv, kv_mask=kv_mask)
    assert out.shape == (B, Sq, H)

    p = params["params"]
    def proj(t, name):
        return t @ p[name]["kernel"] + p[name]["bias"]
    nh, hd = 2, H // 2
    q = proj(x, "query").reshape(B, Sq, nh, hd).transpose(0, 2, 1, 3)
    k = proj(kv, "key").reshape(B, Sk, nh, hd).transpose(0, 2, 1, 3)
    v = proj(kv, "value").reshape(B, Sk, nh, hd).transpose(0, 2, 1, 3)
    want = _dense_reference(q, k, v, kv_mask[:, None, None, :])
    want = want.transpose(0, 2, 1, 3).reshape(B, Sq, H)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_funnel_boundary_layer_attends_unpooled_keys():
    """At a pooling boundary the layer must see the UNPOOLED key/value
    sequence: perturbing only the second token of a pooled pair changes
    the boundary layer's output even though the pooled QUERY of a
    mean-pooled pair alone cannot distinguish (a,b) from (b,a)."""
    cfg = bert_variant("funnel", vocab_size=60).replace(
        hidden_size=16, intermediate_size=32, num_heads=2, num_layers=2,
        pool_blocks=2, hidden_dropout=0.0, attention_dropout=0.0)
    model = BertModel(cfg)
    rng = np.random.default_rng(5)
    S = 9
    ids = rng.integers(3, 60, (1, S)).astype(np.int32)
    mask = np.ones((1, S), np.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(ids),
                        jnp.asarray(mask))
    h1, _ = model.apply(params, jnp.asarray(ids), jnp.asarray(mask))
    # swap a pooled pair (positions 1,2 pool together): mean is invariant
    # but the unpooled keys are not
    ids2 = ids.copy()
    ids2[0, 1], ids2[0, 2] = ids[0, 2], ids[0, 1]
    if ids2[0, 1] == ids2[0, 2]:
        ids2[0, 2] = (ids2[0, 2] + 1) % 60 or 3
    h2, _ = model.apply(params, jnp.asarray(ids2), jnp.asarray(mask))
    assert h1.shape[1] == 1 + (S - 1 + 1) // 2  # CLS + ceil(8/2)... pooled
    # pooled length: cls + ceil((S-1)/2)
    assert h1.shape[1] == 1 + -(-(S - 1) // 2)
    assert not np.allclose(np.asarray(h1), np.asarray(h2), atol=1e-6)


def test_reformer_axial_positions_structure_and_layout():
    """Reformer uses factored axial position embeddings (HF
    axial_pos_shape (40,32)): two small tables replace the [1280, H]
    matrix, and position p reads concat(w0[p // s1], w1[p % s1])."""
    cfg = bert_variant("reformer", vocab_size=80).replace(
        hidden_size=32, intermediate_size=64, num_heads=4, num_layers=2,
        hidden_dropout=0.0, attention_dropout=0.0)
    model = BertModel(cfg)
    S = 70                      # crosses the s1=32 row boundary twice
    ids = np.full((1, S), 5, np.int32)   # identical tokens everywhere
    mask = np.ones((1, S), np.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(ids),
                        jnp.asarray(mask))
    p = params["params"]
    assert "position_embeddings" not in p
    d0, d1 = 32 // 4, 32 - 32 // 4
    assert p["axial_pos_0"].shape == (40, 1, d0)
    assert p["axial_pos_1"].shape == (1, 32, d1)

    # layout exactness: a 0-layer model's output is LayerNorm(word +
    # axial_position) — rebuild the factored table row-major
    # (p = i0*32 + i1, HF AxialPositionEmbeddings order) in numpy and
    # compare the whole embedding path
    cfg0 = cfg.replace(num_layers=0)
    model0 = BertModel(cfg0)
    params0 = model0.init(jax.random.PRNGKey(1), jnp.asarray(ids),
                          jnp.asarray(mask))
    hidden, _ = model0.apply(params0, jnp.asarray(ids), jnp.asarray(mask))
    p0 = params0["params"]
    ax0 = np.asarray(p0["axial_pos_0"])[:, 0, :]   # [40, d0]
    ax1 = np.asarray(p0["axial_pos_1"])[0]         # [32, d1]
    full = np.concatenate(
        [np.repeat(ax0, 32, axis=0),               # i0 varies per 32-row
         np.tile(ax1, (40, 1))], axis=1)           # i1 cycles inside rows
    word = np.asarray(p0["word_embeddings"]["embedding"])[5]
    emb = word[None] + full[:S]                    # [S, H]
    mu = emb.mean(-1, keepdims=True)
    var = emb.var(-1, keepdims=True)
    want = (emb - mu) / np.sqrt(var + 1e-12)       # LN scale=1, bias=0
    np.testing.assert_allclose(np.asarray(hidden)[0], want,
                               rtol=1e-4, atol=1e-4)


def test_bigbird_sparse_matches_dense():
    """Round-5: the sparse gather execution of the BigBird pattern must
    exactly equal the dense-mask formulation (values and gradients) —
    including a non-block-multiple S and masked key tails."""
    from news_recommendation_mind_tpu.models.bert import (
        bigbird_block_sparse_attention)

    rng = np.random.default_rng(0)
    for S in (512, 500):                  # 500: pad path (nb=8, Sp=512)
        B, nh, hd, block, n_rand = 2, 3, 8, 64, 2
        q, k, v = (jnp.asarray(
            rng.standard_normal((B, nh, S, hd)), jnp.float32)
            for _ in range(3))
        key_mask = np.ones((B, S), np.float32)
        key_mask[0, -70:] = 0.0           # masked tail crossing a block
        key_mask = jnp.asarray(key_mask)
        pattern = _bigbird_block_pattern(S, block, n_rand, nh, seed=3)
        assert pattern.shape[1] >= 8      # the sparse-routing regime

        # dense reference: expanded block map × key validity
        nb = pattern.shape[1]
        pat = jnp.asarray(
            np.repeat(np.repeat(pattern, block, 1), block, 2)[:, :S, :S],
            jnp.float32)
        mask = pat[None] * key_mask[:, None, None, :]

        def dense(q, k, v):
            return _dense_reference(q, k, v, mask)

        def sparse(q, k, v):
            return bigbird_block_sparse_attention(
                q, k, v, key_mask, pattern, block)

        np.testing.assert_allclose(
            np.asarray(sparse(q, k, v)), np.asarray(dense(q, k, v)),
            atol=1e-5, rtol=1e-5)

        do = jnp.asarray(rng.standard_normal((B, nh, S, hd)), jnp.float32)
        g_d = jax.grad(lambda *a: jnp.sum(dense(*a) * do),
                       argnums=(0, 1, 2))(q, k, v)
        g_s = jax.grad(lambda *a: jnp.sum(sparse(*a) * do),
                       argnums=(0, 1, 2))(q, k, v)
        for a, b, name in zip(g_d, g_s, "qkv"):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       atol=2e-4, rtol=2e-4,
                                       err_msg=f"S={S} d{name}")


def test_bigbird_model_routes_sparse_by_length(monkeypatch):
    """Model-level routing: ≥8 blocks → the sparse gather path; short
    news-tower sequences stay dense."""
    from news_recommendation_mind_tpu.models import bert as bert_mod

    calls = []
    real = bert_mod.bigbird_block_sparse_attention

    def spy(*a, **kw):
        calls.append(a[0].shape)
        return real(*a, **kw)

    monkeypatch.setattr(bert_mod, "bigbird_block_sparse_attention", spy)
    cfg = bert_variant("bigbird", vocab_size=97, num_layers=1).replace(
        hidden_size=32, num_heads=2, intermediate_size=32,
        hidden_dropout=0.0, attention_dropout=0.0)
    model = BertModel(cfg)
    rng = np.random.default_rng(0)
    S = 512
    ids = jnp.asarray(rng.integers(1, 97, (2, S)), jnp.int32)
    mask = jnp.ones((2, S), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), ids, mask)
    calls.clear()                         # init traces the forward too
    h, _ = model.apply(params, ids, mask)
    assert calls == [(2, 2, S, 16)]
    assert np.isfinite(np.asarray(h)).all()

    calls.clear()
    ids30 = jnp.asarray(rng.integers(1, 97, (2, 30)), jnp.int32)
    mask30 = jnp.ones((2, 30), jnp.float32)
    params30 = model.init(jax.random.PRNGKey(0), ids30, mask30)
    h30, _ = model.apply(params30, ids30, mask30)
    assert calls == []                    # nb=1 → dense branch
    assert np.isfinite(np.asarray(h30)).all()


def test_bigbird_kernel_routing(monkeypatch):
    """Pin when the Pallas bigbird kernel engages (round-5 review
    finding): TPU backend + >=8 blocks + block-multiple S + plannable
    heads -> bigbird_mhsa; on TPU WITHOUT the kernel the dense branch
    must run (the XLA gather path measured slower than dense there);
    off-TPU long-S keeps the gather path (no S^2 memory)."""
    from news_recommendation_mind_tpu.models import bert as bert_mod
    from news_recommendation_mind_tpu.ops import pallas_attention as pa

    kernel_calls, gather_calls = [], []
    real_kernel = pa.bigbird_mhsa
    real_gather = bert_mod.bigbird_block_sparse_attention

    def kernel_spy(q, k, v, m, n_heads, pattern, block, interpret=False):
        kernel_calls.append(q.shape)
        return real_kernel(q, k, v, m, n_heads, pattern, block,
                           interpret=True)

    def gather_spy(*a, **kw):
        gather_calls.append(a[0].shape)
        return real_gather(*a, **kw)

    monkeypatch.setattr(pa, "bigbird_mhsa", kernel_spy)
    monkeypatch.setattr(bert_mod, "bigbird_block_sparse_attention",
                        gather_spy)
    cfg = bert_variant("bigbird", vocab_size=97, num_layers=1).replace(
        hidden_size=128, num_heads=2, intermediate_size=64,
        hidden_dropout=0.0, attention_dropout=0.0)
    model = BertModel(cfg)
    rng = np.random.default_rng(1)
    S = 512
    ids = jnp.asarray(rng.integers(1, 97, (2, S)), jnp.int32)
    mask = jnp.ones((2, S), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), ids, mask)
    h_cpu, _ = model.apply(params, ids, mask)   # off-TPU -> gather path
    assert gather_calls and not kernel_calls
    gather_calls.clear()

    monkeypatch.setattr(bert_mod, "_tpu_backend", lambda: True)
    h_tpu, _ = model.apply(params, ids, mask)   # TPU -> kernel
    assert kernel_calls == [(2, S, 128)] and not gather_calls
    np.testing.assert_allclose(np.asarray(h_tpu), np.asarray(h_cpu),
                               atol=2e-5, rtol=2e-5)

    # TPU but unplannable (hd=48 doesn't tile 128-lane groups and
    # H > 128): dense branch, NOT the gather path
    kernel_calls.clear()
    cfg2 = cfg.replace(hidden_size=144, num_heads=3, intermediate_size=64)
    model2 = BertModel(cfg2)
    ids2 = jnp.asarray(rng.integers(1, 97, (1, S)), jnp.int32)
    mask2 = jnp.ones((1, S), jnp.float32)
    params2 = model2.init(jax.random.PRNGKey(0), ids2, mask2)
    h2, _ = model2.apply(params2, ids2, mask2)
    assert not kernel_calls and not gather_calls
    assert np.isfinite(np.asarray(h2)).all()
