"""Model library tests: shapes, masking semantics, loss math, determinism."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from news_recommendation_mind_tpu.models import (
    AttentionPooling, AveragePooling, CnnNewsEncoder, LsturUserEncoder,
    MhaNewsEncoder, MhaUserEncoder, RnnNewsEncoder, RnnUserEncoder,
    TransformerNewsEncoder, TwoTower, WordEmbedding, make_news_encoder,
    make_user_encoder, scaled_dp_attention, train_loss,
)
from news_recommendation_mind_tpu.models.attention import masked_softmax

B, N, S, E, H = 2, 3, 7, 16, 8
KEY = jax.random.PRNGKey(0)


def _emb():
    return jax.random.normal(KEY, (B, N, S, E))


def _mask():
    m = np.ones((B, N, S), np.float32)
    m[:, :, 5:] = 0
    return jnp.asarray(m)


def test_masked_softmax_zeroes_masked():
    scores = jnp.asarray(np.random.default_rng(0).normal(size=(2, 4)),
                         jnp.float32)
    mask = jnp.asarray([[1, 1, 0, 0], [0, 0, 0, 0]], jnp.float32)
    p = masked_softmax(scores, mask)
    assert float(p[0, 2]) == 0.0 and float(p[0, 3]) == 0.0
    np.testing.assert_allclose(float(p[0, :2].sum()), 1.0, atol=1e-6)
    # fully-masked row → zeros, not NaN
    assert float(jnp.abs(p[1]).sum()) == 0.0


def test_scaled_dp_attention_matches_manual():
    rng = np.random.default_rng(1)
    q = rng.normal(size=(1, 4)).astype(np.float32)
    k = rng.normal(size=(5, 4)).astype(np.float32)
    v = rng.normal(size=(5, 3)).astype(np.float32)
    out = scaled_dp_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    scores = q @ k.T / np.sqrt(4)
    p = np.exp(scores - scores.max())
    p /= p.sum()
    np.testing.assert_allclose(np.asarray(out), p @ v, atol=1e-5)


@pytest.mark.parametrize("name", ["cnn", "mha", "transformer", "rnn"])
def test_news_encoder_shapes(name):
    enc = make_news_encoder(name, hidden_dim=H, embedding_dim=E,
                            head_num=4, dropout_p=0.2)
    params = enc.init(KEY, _emb(), _mask())
    tokens, repr_ = enc.apply(params, _emb(), _mask())
    assert tokens.shape == (B, N, S, H)
    assert repr_.shape == (B, N, H)
    assert np.isfinite(np.asarray(repr_)).all()


def test_cnn_encoder_ignores_masked_tokens():
    """Changing a masked token must not change the pooled repr (the conv
    sees it, but pooling masks it; check the final position which only
    the pool touches)."""
    enc = CnnNewsEncoder(H)
    emb = np.asarray(_emb())
    params = enc.init(KEY, jnp.asarray(emb), _mask())
    _, r1 = enc.apply(params, jnp.asarray(emb), _mask())
    emb2 = emb.copy()
    emb2[:, :, 6, :] += 100.0  # masked token, not adjacent to valid ones
    _, r2 = enc.apply(params, jnp.asarray(emb2), _mask())
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r2), atol=1e-4)


@pytest.mark.parametrize("name", ["lstm", "gru", "mha", "attn", "avg"])
def test_user_encoder_shapes(name):
    enc = make_user_encoder(name, hidden_dim=H, head_num=4)
    reprs = jax.random.normal(KEY, (B, N, H))
    his_mask = jnp.asarray(np.array([[1, 1, 0], [1, 0, 0]], np.float32))
    params = enc.init(KEY, reprs, his_mask)
    out = enc.apply(params, reprs, his_mask=his_mask)
    assert out.shape == (B, 1, H)


def test_rnn_user_encoder_respects_mask():
    enc = RnnUserEncoder(H)
    reprs = np.asarray(jax.random.normal(KEY, (B, N, H)))
    his_mask = jnp.asarray(np.array([[1, 1, 0], [1, 0, 0]], np.float32))
    params = enc.init(KEY, jnp.asarray(reprs), his_mask)
    out1 = enc.apply(params, jnp.asarray(reprs), his_mask=his_mask)
    reprs2 = reprs.copy()
    reprs2[0, 2] += 50.0  # masked history slot
    out2 = enc.apply(params, jnp.asarray(reprs2), his_mask=his_mask)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-5)


def test_lstur_user_embedding_seeds_state():
    enc = LsturUserEncoder(H, user_num=10)
    reprs = jax.random.normal(KEY, (B, N, H))
    params = enc.init(KEY, reprs, None, jnp.asarray([1, 2]))
    out_u1 = enc.apply(params, reprs, user_id=jnp.asarray([1, 2]))
    out_u2 = enc.apply(params, reprs, user_id=jnp.asarray([3, 4]))
    assert not np.allclose(np.asarray(out_u1), np.asarray(out_u2))
    # train-mode dropout needs an rng and changes the outcome sometimes
    out_tr = enc.apply(params, reprs, user_id=jnp.asarray([1, 2]),
                       deterministic=False,
                       rngs={"dropout": jax.random.PRNGKey(7)})
    assert out_tr.shape == (B, 1, H)


def test_train_loss_math():
    scores = jnp.asarray([[2.0, 1.0, 0.0]])
    label = jnp.asarray([0])
    expected = -np.log(np.exp(2) / (np.exp(2) + np.exp(1) + np.exp(0)))
    np.testing.assert_allclose(float(train_loss(scores, label)), expected,
                               rtol=1e-6)
    # masked candidate drops out of the partition function
    mask = jnp.asarray([[1.0, 1.0, 0.0]])
    expected_masked = -np.log(np.exp(2) / (np.exp(2) + np.exp(1)))
    np.testing.assert_allclose(
        float(train_loss(scores, label, mask)), expected_masked, rtol=1e-6)


def _build_two_tower(encN="cnn", encU="lstm", vocab=50):
    return TwoTower(
        embedding=WordEmbedding(vocab, E),
        news_encoder=make_news_encoder(encN, hidden_dim=H, embedding_dim=E,
                                       head_num=4, dropout_p=0.2),
        user_encoder=make_user_encoder(encU, hidden_dim=H, head_num=4,
                                       user_num=10),
        hidden_dim=H,
    )


def _toy_batch(rng, bs=2, cdd=3, his=4, sl=6):
    return {
        "user_id": jnp.asarray(rng.integers(1, 10, bs), jnp.int32),
        "cdd_token": jnp.asarray(rng.integers(0, 50, (bs, cdd, sl)), jnp.int32),
        "cdd_attn": jnp.ones((bs, cdd, sl), jnp.float32),
        "his_token": jnp.asarray(rng.integers(0, 50, (bs, his, sl)), jnp.int32),
        "his_attn": jnp.ones((bs, his, sl), jnp.float32),
        "his_mask": jnp.ones((bs, his), jnp.float32),
        "cdd_mask": jnp.ones((bs, cdd), jnp.float32),
        "label": jnp.zeros((bs,), jnp.int32),
    }


@pytest.mark.parametrize("encN,encU", [("cnn", "lstm"), ("mha", "mha"),
                                       ("transformer", "lstur")])
def test_two_tower_forward(encN, encU, rng):
    model = _build_two_tower(encN, encU)
    batch = _toy_batch(rng)
    params = model.init(KEY, batch)
    scores = model.apply(params, batch)
    assert scores.shape == (2, 3)
    loss = train_loss(scores, batch["label"], batch["cdd_mask"])
    assert np.isfinite(float(loss))


def test_two_tower_grads_flow(rng):
    model = _build_two_tower()
    batch = _toy_batch(rng)
    params = model.init(KEY, batch)

    def loss_fn(p):
        scores = model.apply(p, batch)
        return train_loss(scores, batch["label"], batch["cdd_mask"])

    grads = jax.grad(loss_fn)(params)
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)
    # every parameter receives gradient signal
    nonzero = [float(jnp.abs(g).max()) > 0 for g in flat]
    assert sum(nonzero) >= len(flat) - 1  # allow e.g. unused bias


def test_two_tower_fast_path_consistency(rng):
    """encode_news + encode_user_from_reprs == full forward (the fast-eval
    contract, reference models/TwoTowerBaseModel.py:78-84)."""
    model = _build_two_tower()
    batch = _toy_batch(rng)
    params = model.init(KEY, batch)
    full = model.apply(params, batch)
    cdd_repr = model.apply(params, batch["cdd_token"], batch["cdd_attn"],
                           method=TwoTower.encode_news)
    his_repr = model.apply(params, batch["his_token"], batch["his_attn"],
                           method=TwoTower.encode_news)
    user_repr = model.apply(params, his_repr, batch["his_mask"],
                            method=TwoTower.encode_user_from_reprs)
    fast = model.apply(params, cdd_repr, user_repr,
                       method=TwoTower.compute_score)
    np.testing.assert_allclose(np.asarray(full), np.asarray(fast), atol=1e-5)
