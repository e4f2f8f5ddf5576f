"""FusedCnnNewsEncoder == WordEmbedding + CnnNewsEncoder, exactly.

The fused module pre-applies the conv to the vocabulary table
(news_encoders.py FusedCnnNewsEncoder docstring); since no dropout or
nonlinearity sits between the table and the conv, outputs and gradients
must match the unfused pair to float32 numerical precision.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from news_recommendation_mind_tpu.models import (
    TwoTower, WordEmbedding, make_news_encoder, make_user_encoder,
)
from news_recommendation_mind_tpu.models.news_encoders import (
    CnnNewsEncoder, FusedCnnNewsEncoder, fuse_cnn_params, unfuse_cnn_params,
)
from news_recommendation_mind_tpu.models.two_tower import train_loss

V, E, H, B, N, S = 97, 24, 16, 3, 4, 7


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(0)
    tokens = rng.integers(0, V, (B, N, S)).astype(np.int32)
    attn = (rng.random((B, N, S)) > 0.2).astype(np.float32)
    attn[..., 0] = 1.0
    return jnp.asarray(tokens), jnp.asarray(attn)


def _init_pair(tokens, attn):
    emb = WordEmbedding(V, E)
    enc = CnnNewsEncoder(H)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    emb_p = emb.init(k1, tokens)["params"]
    enc_p = enc.init(k2, emb.apply({"params": emb_p}, tokens), attn)["params"]
    return emb, enc, emb_p, enc_p


def test_forward_exact(data):
    tokens, attn = data
    emb, enc, emb_p, enc_p = _init_pair(tokens, attn)
    x_ref, r_ref = enc.apply({"params": enc_p},
                             emb.apply({"params": emb_p}, tokens), attn)
    fused = FusedCnnNewsEncoder(V, E, H)
    f_p = fuse_cnn_params(emb_p, enc_p)
    x_f, r_f = fused.apply({"params": f_p}, tokens, attn)
    np.testing.assert_allclose(np.asarray(x_f), np.asarray(x_ref),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(r_f), np.asarray(r_ref),
                               atol=1e-5, rtol=1e-5)


def test_param_roundtrip(data):
    tokens, attn = data
    _, _, emb_p, enc_p = _init_pair(tokens, attn)
    f_p = fuse_cnn_params(emb_p, enc_p)
    emb_p2, enc_p2 = unfuse_cnn_params(f_p)
    for a, b in zip(jax.tree_util.tree_leaves((emb_p, enc_p)),
                    jax.tree_util.tree_leaves((emb_p2, enc_p2))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_gradients_exact(data):
    tokens, attn = data
    emb, enc, emb_p, enc_p = _init_pair(tokens, attn)

    def loss_ref(ps):
        _, r = enc.apply({"params": ps["enc"]},
                         emb.apply({"params": ps["emb"]}, tokens), attn)
        return (r.astype(jnp.float32) ** 2).sum()

    g_ref = jax.grad(loss_ref)({"emb": emb_p, "enc": enc_p})

    fused = FusedCnnNewsEncoder(V, E, H)
    f_p = fuse_cnn_params(emb_p, enc_p)

    def loss_f(p):
        _, r = fused.apply({"params": p}, tokens, attn)
        return (r.astype(jnp.float32) ** 2).sum()

    g_f = jax.grad(loss_f)(f_p)
    np.testing.assert_allclose(np.asarray(g_f["embedding"]),
                               np.asarray(g_ref["emb"]["embedding"]),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(g_f["kernel"]),
                               np.asarray(g_ref["enc"]["Conv_0"]["kernel"]),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(g_f["bias"]),
                               np.asarray(g_ref["enc"]["Conv_0"]["bias"]),
                               atol=1e-4, rtol=1e-4)


def test_in_two_tower_trains(data):
    """Fused encoder slots into TwoTower with embedding=None and trains."""
    tokens, attn = data
    model = TwoTower(
        embedding=None,
        news_encoder=FusedCnnNewsEncoder(V, E, H),
        user_encoder=make_user_encoder("lstm", hidden_dim=H, head_num=4),
        hidden_dim=H,
    )
    batch = {
        "cdd_token": tokens[:, :2], "cdd_attn": attn[:, :2],
        "his_token": tokens, "his_attn": attn,
        "his_mask": jnp.ones((B, N), jnp.float32),
        "cdd_mask": jnp.ones((B, 2), jnp.float32),
        "label": jnp.zeros((B,), jnp.int32),
        "user_id": jnp.arange(B, dtype=jnp.int32),
    }
    params = model.init(jax.random.PRNGKey(0), batch)
    scores = model.apply(params, batch, deterministic=True)
    assert scores.shape == (B, 2)
    loss, grads = jax.value_and_grad(
        lambda p: train_loss(model.apply(p, batch, deterministic=True),
                             batch["label"], batch["cdd_mask"]))(params)
    assert np.isfinite(float(loss))
    assert all(np.isfinite(np.asarray(g)).all()
               for g in jax.tree_util.tree_leaves(grads))
