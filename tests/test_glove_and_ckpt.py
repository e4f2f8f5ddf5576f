"""GloVe loading and async checkpointing."""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from news_recommendation_mind_tpu.data.glove import (
    find_glove_file, load_glove_matrix,
)
from news_recommendation_mind_tpu.data.tokenizer import WordTokenizer
from news_recommendation_mind_tpu.train import (
    create_train_state, latest_step, load_checkpoint, make_optimizer,
    save_checkpoint,
)
from news_recommendation_mind_tpu.train.checkpoint import (
    wait_for_pending_saves,
)


def test_glove_matrix(tmp_path):
    tok = WordTokenizer.build(["apple banana", "banana cherry"])
    glove_dir = tmp_path / "glove"
    glove_dir.mkdir()
    path = glove_dir / "glove.6b.4d.txt"
    path.write_text("apple 1 2 3 4\nbanana 5 6 7 8\nunrelated 9 9 9 9\n")
    assert find_glove_file([str(glove_dir)]) == str(path)
    mat = load_glove_matrix(str(path), tok, 4)
    assert mat.shape == (tok.vocab_size, 4)
    np.testing.assert_array_equal(mat[tok.vocab["apple"]], [1, 2, 3, 4])
    np.testing.assert_array_equal(mat[tok.vocab["banana"]], [5, 6, 7, 8])
    np.testing.assert_array_equal(mat[tok.pad_token_id], [0, 0, 0, 0])
    # cherry not in glove: keeps random init (nonzero)
    assert np.abs(mat[tok.vocab["cherry"]]).sum() > 0


def test_glove_no_overlap_raises(tmp_path):
    tok = WordTokenizer.build(["apple"])
    p = tmp_path / "glove.txt"
    p.write_text("zzz 1 2\n")
    with pytest.raises(ValueError):
        load_glove_matrix(str(p), tok, 2)


def _tiny_model(embedding):
    from news_recommendation_mind_tpu.models import (
        TwoTower, make_news_encoder, make_user_encoder,
    )
    return TwoTower(
        embedding=embedding,
        news_encoder=make_news_encoder("cnn", hidden_dim=16,
                                       embedding_dim=8, head_num=4,
                                       dropout_p=0.0),
        user_encoder=make_user_encoder("lstm", hidden_dim=16, head_num=4),
        hidden_dim=16,
    )


def _tiny_batch(bs=8, vocab=101, seed=0):
    r = np.random.default_rng(seed)
    return {
        "user_id": r.integers(1, 20, bs).astype(np.int32),
        "cdd_token": r.integers(0, vocab, (bs, 5, 6)).astype(np.int32),
        "cdd_attn": np.ones((bs, 5, 6), np.float32),
        "his_token": r.integers(0, vocab, (bs, 4, 6)).astype(np.int32),
        "his_attn": np.ones((bs, 4, 6), np.float32),
        "his_mask": np.ones((bs, 4), np.float32),
        "cdd_mask": np.ones((bs, 5), np.float32),
        "label": np.zeros(bs, np.int32),
    }


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs >=4 devices")
def test_cross_topology_checkpoint_load(tmp_path):
    """A checkpoint saved under one mesh layout loads under another.

    The reference handles cross-topology load by fixing the DDP `module.`
    prefix in both directions (reference utils/Manager.py:308-343). Here
    the analog is embedding-table row padding: with model_parallel=2 and
    an odd vocab, the sharded table is padded by one row
    (pad_vocab(101, 2) = 102), so dp-only <-> dp x mp loads see a
    row-count mismatch that load_checkpoint must reconcile exactly.
    """
    from news_recommendation_mind_tpu.models import WordEmbedding
    from news_recommendation_mind_tpu.parallel import (
        ShardedWordEmbedding, make_mesh, partition_rules, shard_batch,
        shard_train_state, state_shardings,
    )
    from news_recommendation_mind_tpu.train import make_train_step

    vocab, dim = 101, 8
    mesh = make_mesh((2, 2), ("data", "model"), devices=jax.devices()[:4])
    sharded_model = _tiny_model(
        ShardedWordEmbedding(vocab, dim, mesh=mesh))
    plain_model = _tiny_model(WordEmbedding(vocab, dim))
    batch = _tiny_batch(vocab=vocab)
    opt = make_optimizer(1e-3, 1e-5)

    # --- save under dp x mp (padded 102-row table) ---
    sp = sharded_model.init(jax.random.PRNGKey(0), batch)
    assert sp["params"]["embedding"]["embedding"].shape == (102, dim)
    rule = partition_rules(mesh, vocab_threshold=vocab)
    sharded_state = shard_train_state(create_train_state(sp, opt), mesh,
                                      rule)
    ck = str(tmp_path / "mp2")
    save_checkpoint(ck, "demo", sharded_state)

    # --- load into dp-only (101-row table): pad row truncated ---
    pp = plain_model.init(jax.random.PRNGKey(1), batch)
    restored = load_checkpoint(ck, "demo", create_train_state(pp, opt))
    got = np.asarray(restored.params["params"]["embedding"]["embedding"])
    want = np.asarray(sp["params"]["embedding"]["embedding"])[:vocab]
    np.testing.assert_array_equal(got, want)

    # --- save under dp-only, load into dp x mp: zero rows appended ---
    ck2 = str(tmp_path / "dp")
    save_checkpoint(ck2, "demo", create_train_state(pp, opt))
    template = shard_train_state(create_train_state(sp, opt), mesh, rule)
    restored2 = load_checkpoint(ck2, "demo", template)
    tab = np.asarray(restored2.params["params"]["embedding"]["embedding"])
    np.testing.assert_array_equal(
        tab[:vocab], np.asarray(pp["params"]["embedding"]["embedding"]))
    np.testing.assert_array_equal(tab[vocab:], 0)

    # --- the re-sharded state actually trains under the dp x mp step ---
    shardings = state_shardings(template, mesh, rule)
    step = make_train_step(sharded_model, opt, mesh=mesh,
                           state_sharding=shardings)
    state2 = shard_train_state(restored2, mesh, rule)
    state2, metrics = step(state2, shard_batch(batch, mesh),
                           jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))

    # --- any non-embedding mismatch is a hard error ---
    bad = create_train_state(pp, opt)
    bad_params = jax.tree_util.tree_map(lambda x: x, bad.params)
    bad_params["params"]["user_encoder"] = jax.tree_util.tree_map(
        lambda x: np.zeros((3, 7), np.float32),
        bad_params["params"]["user_encoder"])
    with pytest.raises(ValueError, match="shape mismatch"):
        load_checkpoint(ck, "demo", bad.replace(params=bad_params))


def test_async_checkpoint_roundtrip(tmp_path):
    params = {"w": jnp.arange(6.0).reshape(2, 3)}
    opt = make_optimizer(1e-2, 1e-5)
    state = create_train_state(params, opt)
    ckpt = str(tmp_path / "ck")
    for i in range(3):
        state = state.replace(step=state.step + 1)
        save_checkpoint(ckpt, "demo", state, async_save=True)
    save_checkpoint(ckpt, "demo", state, best=True, async_save=True)
    wait_for_pending_saves()
    assert latest_step(ckpt, "demo") == 3
    restored = load_checkpoint(ckpt, "demo", create_train_state(params, opt),
                               best=True)
    assert int(restored.step) == 3
    np.testing.assert_array_equal(np.asarray(restored.params["w"]),
                                  np.asarray(params["w"]))
