"""Block-banded local+global attention vs the dense banded reference."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from news_recommendation_mind_tpu.models.attention import masked_softmax
from news_recommendation_mind_tpu.models.bert import _local_global_band
from news_recommendation_mind_tpu.ops.local_attention import (
    block_local_attention,
)


def dense_reference(q, k, v, key_mask, window):
    scale = 1.0 / np.sqrt(q.shape[-1])
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
    band = _local_global_band(key_mask, window)          # [B, S, S]
    # global query row 0 attends to every valid key
    B, S = key_mask.shape
    band = band.at[:, 0, :].set(key_mask)
    probs = masked_softmax(scores, band[:, None, :, :])
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v)


@pytest.mark.parametrize("S,window,bs_block,masked", [
    (256, 32, 64, False),
    (256, 32, 64, True),
    (300, 48, 64, True),     # padding path (300 % 64 != 0)
    (130, 64, 64, True),     # window == block
    (512, 32, 128, True),
])
def test_block_matches_dense(S, window, bs_block, masked):
    rng = np.random.default_rng(0)
    B, H, D = 2, 3, 8
    q = jnp.asarray(rng.normal(size=(B, H, S, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, H, S, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, H, S, D)), jnp.float32)
    key_mask = np.ones((B, S), np.float32)
    if masked:
        key_mask[0, S // 2:] = 0
        key_mask[1, S - 7:] = 0
    key_mask = jnp.asarray(key_mask)
    ref = dense_reference(q, k, v, key_mask, window)
    out = block_local_attention(q, k, v, key_mask, window,
                                block_size=bs_block)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_block_gradients_match_dense():
    rng = np.random.default_rng(1)
    B, H, S, D, w = 1, 2, 256, 8, 32
    q = jnp.asarray(rng.normal(size=(B, H, S, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, H, S, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, H, S, D)), jnp.float32)
    key_mask = jnp.asarray(
        (np.arange(S) < 200).astype(np.float32))[None].repeat(B, 0)
    cot = jnp.asarray(rng.normal(size=(B, H, S, D)), jnp.float32)

    def loss_dense(q, k, v):
        return jnp.sum(dense_reference(q, k, v, key_mask, w) * cot)

    def loss_block(q, k, v):
        return jnp.sum(block_local_attention(q, k, v, key_mask, w, 64)
                       * cot)

    gd = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
    gb = jax.grad(loss_block, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gb, gd):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


def test_bert_long_sequence_uses_block_path():
    """longformer-style BertModel forward at S=512 stays exact vs the
    dense S<=256-path computation (same params, split input)."""
    from news_recommendation_mind_tpu.models.bert import (
        BertModel, bert_variant,
    )
    cfg = bert_variant("longformer", vocab_size=100, num_layers=1).replace(
        hidden_dropout=0.0, attention_dropout=0.0)
    model = BertModel(cfg)
    rng = np.random.default_rng(2)
    S = 512
    ids = jnp.asarray(rng.integers(1, 100, (2, S)), jnp.int32)
    mask = jnp.asarray(
        (np.arange(S) < 400).astype(np.float32))[None].repeat(2, 0)
    params = model.init(jax.random.PRNGKey(0), ids, mask)
    hidden, pooled = model.apply(params, ids, mask)
    assert np.isfinite(np.asarray(hidden)).all()
    # far-token invariance: with window 32, perturbing token 500 cannot
    # change position 100's hidden state in a single layer
    ids2 = np.asarray(ids).copy()
    ids2[0, 300] = (ids2[0, 300] + 1) % 100
    h2, _ = model.apply(params, jnp.asarray(ids2), mask)
    np.testing.assert_allclose(np.asarray(hidden[0, 100]),
                               np.asarray(h2[0, 100]), atol=1e-5)
    assert not np.allclose(np.asarray(hidden[0, 300]),
                           np.asarray(h2[0, 300]))
    # ...but the global CLS row does see it
    assert not np.allclose(np.asarray(hidden[0, 0]),
                           np.asarray(h2[0, 0]))
