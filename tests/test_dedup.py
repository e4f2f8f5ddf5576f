"""Unique-news dedup path == plain forward, exactly (values and grads).

forward_from_unique (models/two_tower.py) encodes each distinct article
once and indexes per slot; linearity of gather/scatter makes it exact in
deterministic mode.
"""
import jax
import jax.numpy as jnp
import numpy as np

from news_recommendation_mind_tpu.config import Config
from news_recommendation_mind_tpu.data.loader import TrainLoader
from news_recommendation_mind_tpu.models import (
    TwoTower, WordEmbedding, make_news_encoder, make_user_encoder,
)
from news_recommendation_mind_tpu.models.two_tower import (
    forward_from_unique, train_loss,
)

V, E, H, B, C, N, S, NNEWS = 211, 20, 16, 4, 3, 6, 9, 37


def _model():
    return TwoTower(
        embedding=WordEmbedding(V, E),
        news_encoder=make_news_encoder("cnn", hidden_dim=H,
                                       embedding_dim=E, head_num=4,
                                       dropout_p=0.2),
        user_encoder=make_user_encoder("lstm", hidden_dim=H, head_num=4),
        hidden_dim=H,
    )


def _data():
    rng = np.random.default_rng(3)
    news_tokens = rng.integers(1, V, (NNEWS, S)).astype(np.int32)
    news_tokens[0] = 0
    news_attn = np.ones((NNEWS, S), np.float32)
    cdd_id = rng.integers(0, NNEWS, (B, C)).astype(np.int32)
    his_id = rng.integers(0, NNEWS, (B, N)).astype(np.int32)
    # force duplicates across slots
    cdd_id[:, 1] = cdd_id[:, 0]
    his_id[1] = his_id[0]
    return news_tokens, news_attn, cdd_id, his_id, rng


def test_dedup_forward_and_grads_match():
    news_tokens, news_attn, cdd_id, his_id, rng = _data()
    model = _model()
    full = {
        "user_id": np.arange(B, dtype=np.int32),
        "cdd_token": news_tokens[cdd_id], "cdd_attn": news_attn[cdd_id],
        "his_token": news_tokens[his_id], "his_attn": news_attn[his_id],
        "his_mask": np.ones((B, N), np.float32),
        "cdd_mask": np.ones((B, C), np.float32),
        "label": np.zeros(B, np.int32),
    }
    params = model.init(jax.random.PRNGKey(0), full)

    ids = np.concatenate([cdd_id.ravel(), his_id.ravel()])
    uniq, inv = np.unique(ids, return_inverse=True)
    dedup = dict(full)
    dedup["uniq_token"] = news_tokens[uniq]
    dedup["uniq_attn"] = news_attn[uniq]
    dedup["cdd_pos"] = inv[:cdd_id.size].reshape(cdd_id.shape).astype(np.int32)
    dedup["his_pos"] = inv[cdd_id.size:].reshape(his_id.shape).astype(np.int32)

    s_ref = model.apply(params, full, deterministic=True)
    s_dd = model.apply(params, dedup, True, method=forward_from_unique)
    np.testing.assert_allclose(np.asarray(s_dd), np.asarray(s_ref),
                               atol=1e-5, rtol=1e-5)

    def loss_ref(p):
        return train_loss(model.apply(p, full, deterministic=True),
                          full["label"], full["cdd_mask"])

    def loss_dd(p):
        return train_loss(
            model.apply(p, dedup, True, method=forward_from_unique),
            full["label"], full["cdd_mask"])

    g_ref = jax.grad(loss_ref)(params)
    g_dd = jax.grad(loss_dd)(params)
    for a, b in zip(jax.tree_util.tree_leaves(g_ref),
                    jax.tree_util.tree_leaves(g_dd)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=1e-5, rtol=1e-4)


def test_loader_emits_consistent_dedup_batches():
    from news_recommendation_mind_tpu.data.cache import Behaviors
    news_tokens, news_attn, _, _, _ = _data()

    class FakeNews:
        def truncated(self, sl):
            return news_tokens[:, :sl], news_attn[:, :sl]

    rng = np.random.default_rng(0)
    n_impr = 25
    pos = rng.integers(1, NNEWS, n_impr).astype(np.int32)
    neg_flat, neg_off = [], [0]
    for _ in range(n_impr):
        k = rng.integers(1, 6)
        neg_flat.extend(rng.integers(1, NNEWS, k).tolist())
        neg_off.append(len(neg_flat))
    his_flat, his_off = [], [0]
    for _ in range(n_impr):
        k = rng.integers(1, N + 2)
        his_flat.extend(rng.integers(1, NNEWS, k).tolist())
        his_off.append(len(his_flat))
    b = Behaviors(mode="train",
                  impr_idx=np.arange(n_impr, dtype=np.int64),
                  uindex=rng.integers(0, 10, n_impr).astype(np.int32),
                  his_flat=np.asarray(his_flat, np.int32),
                  his_offsets=np.asarray(his_off, np.int64),
                  pos=pos,
                  neg_flat=np.asarray(neg_flat, np.int32),
                  neg_offsets=np.asarray(neg_off, np.int64))
    loader = TrainLoader(FakeNews(), b, batch_size=B, npratio=C - 1,
                         his_size=N, signal_length=S, seed=0,
                         backend="numpy", emit_tokens=False, dedup=True)
    batch = next(iter(loader))
    assert set(["uniq_id", "cdd_pos", "his_pos"]) <= set(batch)
    assert batch["uniq_id"].shape[0] % 256 == 0
    # indexing uniq ids by pos reproduces the slot ids
    np.testing.assert_array_equal(batch["uniq_id"][batch["cdd_pos"]],
                                  batch["cdd_id"])
    np.testing.assert_array_equal(batch["uniq_id"][batch["his_pos"]],
                                  batch["his_id"])
