"""Pallas block-banded attention vs the XLA exact version (interpret mode).

Forward and gradients must match ops/local_attention.block_local_attention
(itself verified against the dense banded softmax) bit-for-semantics.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from news_recommendation_mind_tpu.ops.local_attention import (
    block_local_attention,
)
from news_recommendation_mind_tpu.ops.pallas_attention import (
    pallas_block_local_attention,
)

B, H, D = 2, 3, 16


def _data(S, seed=0):
    rng = np.random.default_rng(seed)
    q = rng.standard_normal((B, H, S, D)).astype(np.float32) * 0.5
    k = rng.standard_normal((B, H, S, D)).astype(np.float32) * 0.5
    v = rng.standard_normal((B, H, S, D)).astype(np.float32) * 0.5
    mask = np.ones((B, S), np.float32)
    mask[0, -S // 5:] = 0.0          # padded tail on one row
    return map(jnp.asarray, (q, k, v, mask))


@pytest.mark.parametrize("S,window,bs", [(256, 32, 128), (384, 64, 128),
                                         (130, 17, 64)])
def test_forward_matches_xla(S, window, bs):
    q, k, v, mask = _data(S)
    ref = block_local_attention(q, k, v, mask, window, block_size=bs)
    out = pallas_block_local_attention(q, k, v, mask, window,
                                       block_size=bs, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_gradients_match_xla():
    S, window, bs = 256, 32, 128
    q, k, v, mask = _data(S, seed=1)
    do = jnp.asarray(np.random.default_rng(2).standard_normal(
        (B, H, S, D)).astype(np.float32))

    def loss_ref(q, k, v):
        out = block_local_attention(q, k, v, mask, window, block_size=bs)
        return jnp.sum(out * do)

    def loss_pl(q, k, v):
        out = pallas_block_local_attention(q, k, v, mask, window,
                                           block_size=bs, interpret=True)
        return jnp.sum(out * do)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    g_pl = jax.grad(loss_pl, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_ref, g_pl, "qkv"):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=2e-4, rtol=2e-4,
                                   err_msg=f"d{name}")


# ---- full-width lane-masked banded MHSA (round-4 ledger follow-up) ----

from news_recommendation_mind_tpu.ops.pallas_attention import (  # noqa: E402
    banded_mhsa, banded_mhsa_plan,
)


def _unsplit_data(S, NH, HD, seed=0):
    rng = np.random.default_rng(seed)
    q = rng.standard_normal((B, S, NH * HD)).astype(np.float32) * 0.5
    k = rng.standard_normal((B, S, NH * HD)).astype(np.float32) * 0.5
    v = rng.standard_normal((B, S, NH * HD)).astype(np.float32) * 0.5
    mask = np.ones((B, S), np.float32)
    mask[0, -S // 5:] = 0.0
    return map(jnp.asarray, (q, k, v, mask))


def _ref_banded(q, k, v, mask, n_heads, window, bs):
    """Head-split + block_local_attention + merge — the straightforward
    formulation the full-width kernel must match."""
    Bq, S, Hh = q.shape
    hd = Hh // n_heads
    f = lambda t: t.reshape(Bq, S, n_heads, hd).transpose(0, 2, 1, 3)
    out = block_local_attention(f(q), f(k), f(v), mask, window,
                                block_size=bs)
    return out.transpose(0, 2, 1, 3).reshape(Bq, S, Hh)


def test_banded_mhsa_plan():
    assert banded_mhsa_plan(1024, 768, 12) == (64, 2)   # longformer
    assert banded_mhsa_plan(256, 128, 4) == (32, 4)     # H <= 128
    assert banded_mhsa_plan(256, 96, 5) is None         # no tiling


@pytest.mark.parametrize("S,NH,HD,window,bs", [
    (256, 4, 32, 32, 128),    # two head groups of G=4
    (384, 2, 64, 64, 128),    # G=2, three blocks
    (260, 4, 32, 24, 128),    # padded tail (S not a block multiple)
])
def test_banded_mhsa_forward_matches_split_ref(S, NH, HD, window, bs):
    q, k, v, mask = _unsplit_data(S, NH, HD)
    ref = _ref_banded(q, k, v, mask, NH, window, bs)
    out = banded_mhsa(q, k, v, mask, NH, window, block_size=bs,
                      interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_banded_mhsa_masked_global_and_dead_rows():
    """Round-5 flash-merged global column edge cases: the global key 0
    masked out on one batch row, and a fully-masked batch row (the
    masked_softmax all-zero convention) — both must match the
    straightforward formulation, values and gradients."""
    S, NH, HD, window, bs = 256, 4, 32, 32, 128
    q, k, v, mask = _unsplit_data(S, NH, HD, seed=3)
    mask_np = np.asarray(mask).copy()
    mask_np[0, 0] = 0.0         # global key invalid on row 0
    mask_np[1, :] = 0.0         # fully masked batch row
    mask = jnp.asarray(mask_np)
    do = jnp.asarray(np.random.default_rng(4).standard_normal(
        (B, S, NH * HD)).astype(np.float32))

    def loss(fn, q, k, v):
        return jnp.sum(fn(q, k, v) * do)

    ref_fn = lambda q, k, v: _ref_banded(q, k, v, mask, NH, window, bs)
    pl_fn = lambda q, k, v: banded_mhsa(q, k, v, mask, NH, window,
                                        block_size=bs, interpret=True)
    np.testing.assert_allclose(np.asarray(pl_fn(q, k, v)),
                               np.asarray(ref_fn(q, k, v)),
                               atol=1e-5, rtol=1e-5)
    g_ref = jax.grad(lambda *a: loss(ref_fn, *a), argnums=(0, 1, 2))(q, k, v)
    g_pl = jax.grad(lambda *a: loss(pl_fn, *a), argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_ref, g_pl, "qkv"):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=2e-4, rtol=2e-4,
                                   err_msg=f"d{name}")


def test_banded_mhsa_gradients_match_split_ref():
    S, NH, HD, window, bs = 256, 4, 32, 32, 128
    q, k, v, mask = _unsplit_data(S, NH, HD, seed=1)
    do = jnp.asarray(np.random.default_rng(2).standard_normal(
        (B, S, NH * HD)).astype(np.float32))

    def loss_ref(q, k, v):
        return jnp.sum(_ref_banded(q, k, v, mask, NH, window, bs) * do)

    def loss_pl(q, k, v):
        return jnp.sum(banded_mhsa(q, k, v, mask, NH, window,
                                   block_size=bs, interpret=True) * do)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    g_pl = jax.grad(loss_pl, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_ref, g_pl, "qkv"):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=2e-4, rtol=2e-4,
                                   err_msg=f"d{name}")


# ---- BigBird block-sparse kernel (round 5) ----

from news_recommendation_mind_tpu.ops.pallas_attention import (  # noqa: E402
    bigbird_mhsa,
)
from news_recommendation_mind_tpu.models.bert import (  # noqa: E402
    _bigbird_block_pattern, masked_softmax,
)


def _ref_bigbird(q, k, v, mask, n_heads, pattern, block):
    """Dense-mask formulation (models/bert.py's short-sequence branch)
    on unsplit [B, S, H] inputs — what the kernel must match."""
    Bq, S, Hh = q.shape
    hd = Hh // n_heads
    f = lambda t: t.reshape(Bq, S, n_heads, hd).transpose(0, 2, 1, 3)
    qh, kh, vh = f(q), f(k), f(v)
    pat = np.repeat(np.repeat(np.asarray(pattern, np.float32), block, 1),
                    block, 2)[:, :S, :S]
    m = jnp.asarray(pat)[None] * mask[:, None, None, :]
    scores = jnp.einsum("bhqd,bhkd->bhqk", qh, kh) / jnp.sqrt(
        jnp.asarray(hd, q.dtype))
    probs = masked_softmax(scores, m)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs, vh)
    return out.transpose(0, 2, 1, 3).reshape(Bq, S, Hh)


@pytest.mark.parametrize("S,NH,HD,block", [
    (512, 4, 32, 64),     # two head groups of G=4
    (512, 2, 64, 64),     # G=2
    (500, 4, 32, 64),     # padded tail (S not a block multiple)
])
def test_bigbird_mhsa_matches_dense(S, NH, HD, block):
    q, k, v, mask = _unsplit_data(S, NH, HD)
    pattern = _bigbird_block_pattern(S, block, 2, NH, seed=5)
    ref = _ref_bigbird(q, k, v, mask, NH, pattern, block)
    out = bigbird_mhsa(q, k, v, mask, NH, pattern, block, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_bigbird_mhsa_gradients_match_dense():
    S, NH, HD, block = 512, 4, 32, 64
    q, k, v, mask = _unsplit_data(S, NH, HD, seed=9)
    pattern = _bigbird_block_pattern(S, block, 2, NH, seed=6)
    do = jnp.asarray(np.random.default_rng(10).standard_normal(
        (B, S, NH * HD)).astype(np.float32))

    def loss_ref(q, k, v):
        return jnp.sum(_ref_bigbird(q, k, v, mask, NH, pattern, block)
                       * do)

    def loss_pl(q, k, v):
        return jnp.sum(bigbird_mhsa(q, k, v, mask, NH, pattern, block,
                                    interpret=True) * do)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    g_pl = jax.grad(loss_pl, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_ref, g_pl, "qkv"):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=2e-4, rtol=2e-4,
                                   err_msg=f"d{name}")
