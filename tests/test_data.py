"""Data pipeline tests: synthetic generator → tokenize/cache → loaders."""
import numpy as np
import pytest

from news_recommendation_mind_tpu.data import (
    EvalLoader, HistoryLoader, NewsLoader, TrainLoader, WordTokenizer,
    build_behaviors, build_news_cache, generate_synthetic_mind,
)
from news_recommendation_mind_tpu.data.cache import parse_news_tsv


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("mind"))
    meta = generate_synthetic_mind(root, seed=7)
    nids, texts = parse_news_tsv(f"{root}/MINDsynthetic_train/news.tsv")
    tok = WordTokenizer.build(texts)
    cache_dir = str(tmp_path_factory.mktemp("cache"))
    news = build_news_cache(f"{root}/MINDsynthetic_train/news.tsv",
                            cache_dir, tok, max_token_length=64)
    return root, meta, tok, news


def test_tokenizer_roundtrip():
    tok = WordTokenizer.build(["hello world", "hello again, world!"])
    ids, attn = tok.encode("hello world", 8)
    assert ids[0] == tok.cls_token_id
    assert ids[attn.sum() - 1] == tok.sep_token_id
    assert attn.sum() == 4  # CLS hello world SEP
    # truncation still ends with SEP
    ids2, attn2 = tok.encode(" ".join(["hello"] * 50), 8)
    assert attn2.sum() == 8 and ids2[-1] == tok.sep_token_id


def test_news_cache(dataset):
    root, meta, tok, news = dataset
    assert news.news_num == meta["n_news"]
    # row 0 is the all-pad article (reference utils/MIND.py:125-127)
    assert news.tokens[0].sum() == 0 and news.attn_mask[0].sum() == 0
    toks, attn = news.truncated(10)
    assert toks.shape == (meta["n_news"] + 1, 10)
    # any article longer than 10 tokens ends in [SEP]
    full = news.attn_mask[:, 10:].any(axis=1)
    assert full.any()
    assert (toks[full, 9] == tok.sep_token_id).all()


def test_behaviors_train(dataset):
    root, meta, tok, news = dataset
    b = build_behaviors(f"{root}/MINDsynthetic_train/behaviors.tsv",
                        news.nid2idx, "train")
    assert len(b) > 0
    # every record is a positive click with a negative pool
    assert (b.pos > 0).all()
    assert b.neg_offsets[-1] > 0
    # uid indices are 1-based (0 = pad/cold user)
    assert b.uindex.min() >= 1
    # history ids resolve to valid news rows
    assert b.his_flat.max() <= meta["n_news"]


def test_behaviors_dev_chunking(dataset):
    root, meta, tok, news = dataset
    b = build_behaviors(f"{root}/MINDsynthetic_dev/behaviors.tsv",
                        news.nid2idx, "dev", impr_size=8)
    widths = np.diff(b.cdd_offsets)
    assert widths.max() <= 8
    # 20 candidates/impr chunked at 8 → 3 chunks per impression
    counts = np.bincount(b.impr_idx)
    assert (counts[counts > 0] == 3).all()
    assert b.labels_flat is not None
    assert len(b.labels_flat) == b.cdd_offsets[-1]


def test_behaviors_test_mode(dataset):
    root, meta, tok, news = dataset
    b = build_behaviors(f"{root}/MINDsynthetic_test/behaviors.tsv",
                        news.nid2idx, "test")
    assert b.labels_flat is None
    assert b.cdd_offsets[-1] > 0


def test_train_loader_shapes_and_determinism(dataset):
    root, meta, tok, news = dataset
    b = build_behaviors(f"{root}/MINDsynthetic_train/behaviors.tsv",
                        news.nid2idx, "train")
    kw = dict(batch_size=16, npratio=4, his_size=10, signal_length=12, seed=3)
    loader = TrainLoader(news, b, **kw)
    batch = next(iter(loader))
    assert batch["cdd_token"].shape == (16, 5, 12)
    assert batch["his_token"].shape == (16, 10, 12)
    assert batch["cdd_mask"].shape == (16, 5)
    assert (batch["label"] == 0).all()  # no shuffle → positive at col 0
    # positive candidate is the stored positive
    assert (batch["cdd_id"][:, 0] > 0).all()
    # determinism: same seed+epoch → identical batches
    b2 = next(iter(TrainLoader(news, b, **kw)))
    for k in batch:
        np.testing.assert_array_equal(batch[k], b2[k])
    # different epoch reshuffles
    loader.set_epoch(1)
    b3 = next(iter(loader))
    assert not np.array_equal(b3["cdd_id"], batch["cdd_id"])


def test_train_loader_shuffle_pos(dataset):
    root, meta, tok, news = dataset
    b = build_behaviors(f"{root}/MINDsynthetic_train/behaviors.tsv",
                        news.nid2idx, "train")
    loader = TrainLoader(news, b, batch_size=32, npratio=4, his_size=10,
                         signal_length=12, seed=3, shuffle_pos=True)
    batch = next(iter(loader))
    rows = np.arange(32)
    # label column holds the positive candidate
    pos_ids = batch["cdd_id"][rows, batch["label"]]
    assert (pos_ids > 0).all()
    assert batch["label"].max() > 0  # at least one got moved


def test_train_loader_sharding(dataset):
    root, meta, tok, news = dataset
    b = build_behaviors(f"{root}/MINDsynthetic_train/behaviors.tsv",
                        news.nid2idx, "train")
    kw = dict(batch_size=8, npratio=4, his_size=10, signal_length=12, seed=3)
    l0 = TrainLoader(news, b, num_shards=2, shard_index=0, **kw)
    l1 = TrainLoader(news, b, num_shards=2, shard_index=1, **kw)
    b0, b1 = next(iter(l0)), next(iter(l1))
    assert not np.array_equal(b0["cdd_id"], b1["cdd_id"])


def test_news_loader_covers_all(dataset):
    root, meta, tok, news = dataset
    loader = NewsLoader(news, batch_size=64, signal_length=12)
    seen, n_valid = [], 0
    for batch in loader:
        assert batch["token"].shape == (64, 12)
        seen.extend(batch["news_id"][batch["valid"] == 1].tolist())
        n_valid += int(batch["valid"].sum())
    assert n_valid == meta["n_news"] + 1
    assert sorted(seen) == list(range(meta["n_news"] + 1))


def test_eval_loader_buckets(dataset):
    root, meta, tok, news = dataset
    b = build_behaviors(f"{root}/MINDsynthetic_dev/behaviors.tsv",
                        news.nid2idx, "dev")
    loader = EvalLoader(news, b, batch_size=4, his_size=10, signal_length=12,
                        buckets=(20, 50))
    total_chunks = 0
    for batch in loader:
        w = batch["cdd_id"].shape[1]
        assert w in (20, 50, 2000)
        valid = batch["valid"] == 1
        total_chunks += int(valid.sum())
        # every valid row keeps its true candidate count in the mask
        assert (batch["cdd_mask"][valid].sum(-1) > 0).all()
    assert total_chunks == len(b)


def test_eval_loader_partition(dataset):
    root, meta, tok, news = dataset
    b = build_behaviors(f"{root}/MINDsynthetic_dev/behaviors.tsv",
                        news.nid2idx, "dev")
    ids = []
    for shard in range(3):
        loader = EvalLoader(news, b, batch_size=4, his_size=10,
                            signal_length=12, num_shards=3, shard_index=shard)
        for batch in loader:
            ids.extend(batch["impr_index"][batch["valid"] == 1].tolist())
    # all chunks covered exactly once across shards
    assert len(ids) == len(b)


def test_history_loader(dataset):
    root, meta, tok, news = dataset
    b = build_behaviors(f"{root}/MINDsynthetic_dev/behaviors.tsv",
                        news.nid2idx, "dev")
    loader = HistoryLoader(news, b, batch_size=8, his_size=10,
                           signal_length=12)
    batch = next(iter(loader))
    assert batch["his_token"].shape == (8, 10, 12)


def test_cache_reload(dataset, tmp_path):
    root, meta, tok, news = dataset
    cache = str(tmp_path / "bcache")
    b1 = build_behaviors(f"{root}/MINDsynthetic_dev/behaviors.tsv",
                         news.nid2idx, "dev", cache_dir=cache)
    b2 = build_behaviors("/nonexistent/behaviors.tsv",  # must hit the cache
                         news.nid2idx, "dev", cache_dir=cache)
    np.testing.assert_array_equal(b1.cdd_flat, b2.cdd_flat)
    assert b1.uid2idx == b2.uid2idx
