"""Row-sharded embedding over a 2-D (data x model) virtual mesh."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from news_recommendation_mind_tpu.models import (
    TwoTower, WordEmbedding, make_news_encoder, make_user_encoder,
)
from news_recommendation_mind_tpu.models.two_tower import train_loss
from news_recommendation_mind_tpu.parallel import (
    ShardedWordEmbedding, make_mesh, pad_vocab, partition_rules,
    shard_batch, shard_train_state, sharded_lookup, state_shardings,
)
from news_recommendation_mind_tpu.train import (
    create_train_state, make_optimizer, make_train_step,
)

VOCAB, DIM = 64, 16


@pytest.fixture(scope="module")
def mesh2d():
    return make_mesh((4, 2), ("data", "model"))


def test_sharded_lookup_matches_gather(mesh2d):
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.normal(size=(VOCAB, DIM)), jnp.float32)
    ids = jnp.asarray(rng.integers(0, VOCAB, (8, 3, 5)), jnp.int32)
    table_s = jax.device_put(table, NamedSharding(mesh2d, P("model", None)))
    ids_s = jax.device_put(ids, NamedSharding(
        mesh2d, P("data", None, None)))
    out = sharded_lookup(table_s, ids_s, mesh2d)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(jnp.take(table, ids, axis=0)),
                               atol=1e-6)


def test_sharded_lookup_gradients(mesh2d):
    rng = np.random.default_rng(1)
    table = jnp.asarray(rng.normal(size=(VOCAB, DIM)), jnp.float32)
    ids = jnp.asarray(rng.integers(0, VOCAB, (8, 4)), jnp.int32)
    cot = jnp.asarray(rng.normal(size=(8, 4, DIM)), jnp.float32)

    def loss_plain(t):
        return jnp.sum(jnp.take(t, ids, axis=0) * cot)

    def loss_sharded(t):
        t = jax.device_put(t, NamedSharding(mesh2d, P("model", None)))
        return jnp.sum(sharded_lookup(t, ids, mesh2d) * cot)

    g_plain = jax.grad(loss_plain)(table)
    g_sharded = jax.grad(loss_sharded)(table)
    np.testing.assert_allclose(np.asarray(g_sharded), np.asarray(g_plain),
                               atol=1e-5)


def test_pad_vocab():
    assert pad_vocab(30522, 4) == 30524
    assert pad_vocab(64, 2) == 64


def _toy_batch(rng, bs=8, cdd=3, his=4, sl=6):
    return {
        "user_id": rng.integers(1, 10, bs).astype(np.int32),
        "cdd_token": rng.integers(0, VOCAB, (bs, cdd, sl)).astype(np.int32),
        "cdd_attn": np.ones((bs, cdd, sl), np.float32),
        "his_token": rng.integers(0, VOCAB, (bs, his, sl)).astype(np.int32),
        "his_attn": np.ones((bs, his, sl), np.float32),
        "his_mask": np.ones((bs, his), np.float32),
        "cdd_mask": np.ones((bs, cdd), np.float32),
        "label": np.zeros(bs, np.int32),
    }


def _model(embedding):
    return TwoTower(
        embedding=embedding,
        news_encoder=make_news_encoder("cnn", hidden_dim=8,
                                       embedding_dim=DIM, head_num=4,
                                       dropout_p=0.0),
        user_encoder=make_user_encoder("attn", hidden_dim=8, head_num=4),
        hidden_dim=8,
    )


def test_sharded_train_step_matches_replicated(mesh2d, rng):
    """Full train step with a row-sharded table == plain replicated run."""
    batch = _toy_batch(rng)
    key = jax.random.PRNGKey(0)

    plain = _model(WordEmbedding(VOCAB, DIM))
    sharded = _model(ShardedWordEmbedding(VOCAB, DIM, mesh=mesh2d))

    params_p = plain.init(key, batch)
    params_s = sharded.init(key, batch)
    # same init: copy the plain table into the sharded layout
    params_s = jax.tree_util.tree_map(lambda a: a, params_s)
    flat_p = params_p["params"]["embedding"]["embedding"]
    params_s["params"]["embedding"]["embedding"] = flat_p

    opt = make_optimizer(1e-2, 1e-5)
    rule = partition_rules(mesh2d, vocab_threshold=VOCAB)

    state_s = create_train_state(params_s, opt)
    state_s = shard_train_state(state_s, mesh2d, rule)
    shardings = state_shardings(state_s, mesh2d, rule)
    step_s = make_train_step(sharded, opt, mesh=mesh2d, donate=False,
                             state_sharding=shardings)

    mesh1d = make_mesh((8,), ("data",))
    state_p = create_train_state(params_p, opt)
    step_p = make_train_step(plain, opt, mesh=mesh1d, donate=False)

    rngk = jax.random.PRNGKey(0)
    batch_s = shard_batch(batch, mesh2d)
    new_s, m_s = step_s(state_s, batch_s, rngk)
    new_p, m_p = step_p(state_p, batch, rngk)

    np.testing.assert_allclose(float(m_s["loss"]), float(m_p["loss"]),
                               rtol=1e-5)
    # the sharded table actually lives on the model axis
    table = new_s.params["params"]["embedding"]["embedding"]
    spec = table.sharding.spec
    assert spec[0] == "model"
    # and its values match the replicated run's table after one update
    np.testing.assert_allclose(
        np.asarray(table),
        np.asarray(new_p.params["params"]["embedding"]["embedding"]),
        atol=1e-5)


def test_partition_rules_targets_embedding_only(mesh2d):
    rule = partition_rules(mesh2d, vocab_threshold=32)
    big = jnp.zeros((64, 8))
    small = jnp.zeros((8, 8))
    emb_path = (jax.tree_util.DictKey("params"),
                jax.tree_util.DictKey("embedding"),
                jax.tree_util.DictKey("embedding"))
    other_path = (jax.tree_util.DictKey("params"),
                  jax.tree_util.DictKey("dense"),
                  jax.tree_util.DictKey("kernel"))
    assert rule(emb_path, big).spec == P("model", None)
    assert rule(emb_path, small).spec == P()
    assert rule(other_path, big).spec == P()
