"""BM25 / recall / dataset-tool parity tests."""
import os

import numpy as np
import pytest

from news_recommendation_mind_tpu.data import generate_synthetic_mind
from news_recommendation_mind_tpu.utils.bm25 import (
    BM25, BM25Token, collate_recall, construct_inverted_index,
)
from news_recommendation_mind_tpu.utils.data_tools import (
    CountFreq, DeDuplicate, Truncate, construct_nid2idx,
    construct_sequential_behaviors, construct_uid2idx, gather_same_user_impr,
    get_id2idx, statistic_mind,
)


@pytest.fixture(scope="module")
def mind_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("mind"))
    generate_synthetic_mind(root, seed=3)
    return root


def test_bm25_orders_by_score():
    docs = ["", "apple apple apple banana", "banana cherry cherry"]
    out = BM25()(docs)
    assert out[0] == ""
    # the reference counts df per OCCURRENCE (reference
    # utils/utils.py:361-366), so thrice-repeated 'apple' gets a low idf
    # and the once-seen 'banana' outranks it — parity preserved
    assert out[1].split()[0] == "banana"
    assert set(out[1].split()) == {"apple", "banana"}
    assert set(out[2].split()) == {"banana", "cherry"}


def test_bm25_token_scores():
    docs = [[101, 5, 5, 7], [101, 7, 8]]
    bm = BM25Token(docs)
    # token 5 only in doc0 → positive score there, zero in doc1
    assert bm(5, 0) > 0
    assert bm(5, 1) == 0
    # rarer token scores higher than common one in the same doc
    assert bm(5, 0) > bm(7, 0)


def test_inverted_index():
    corpus = [[101, 5, 7], [101, 5], [101, 9]]
    bm = BM25Token(corpus)
    arr = construct_inverted_index(corpus, bm, vocab_size=128, top_k=4)
    assert arr.shape == (128, 4, 2)
    # token 9 appears in doc 2 only
    assert arr[9, 0, 0] == 2
    # absent token points at the padding doc
    assert (arr[3, :, 0] == len(corpus)).all()
    # special ids are not indexed
    assert (arr[101, :, 0] == len(corpus)).all()


def test_collate_recall():
    out = collate_recall([{"user_id": 1, "cdd_id": [1, 2]},
                          {"user_id": 2, "cdd_id": [3]}])
    assert isinstance(out["user_id"], np.ndarray)
    assert out["cdd_id"] == [[1, 2], [3]]


def test_construct_id_maps(mind_root, tmp_path):
    news_tsv = f"{mind_root}/MINDsynthetic_train/news.tsv"
    out = str(tmp_path / "nid2idx.json")
    nid2idx = construct_nid2idx(news_tsv, out)
    assert nid2idx["N0"] == 1  # 1-based, file order
    assert get_id2idx(out) == nid2idx

    uid2idx = construct_uid2idx(
        [f"{mind_root}/MINDsynthetic_{s}/behaviors.tsv"
         for s in ("train", "dev", "test")])
    assert min(uid2idx.values()) == 1
    assert len(set(uid2idx.values())) == len(uid2idx)


def test_statistics(mind_root):
    stats = statistic_mind(f"{mind_root}/MINDsynthetic_train")
    assert stats["avg_title_length"] == pytest.approx(12, abs=1)
    assert stats["avg_impr_length"] == pytest.approx(20, abs=1)


def test_sequential_behaviors(mind_root, tmp_path):
    import shutil
    d = str(tmp_path / "seq")
    shutil.copytree(f"{mind_root}/MINDsynthetic_train", d)
    out = construct_sequential_behaviors(d)
    assert os.path.exists(out)
    # later impressions of a repeat user gained history entries
    orig = {l.split("\t")[0]: l.split("\t")[3] for l in
            open(f"{d}/behaviors.tsv", encoding="utf-8")}
    seq = {l.split("\t")[0]: l.split("\t")[3] for l in
           open(out, encoding="utf-8")}
    grown = [k for k in orig if len(seq[k]) > len(orig[k])]
    assert grown  # at least one record grew


def test_gather_same_user_impr(mind_root, tmp_path):
    import shutil
    src = f"{mind_root}/MINDsynthetic_dev/behaviors.tsv"
    dst = str(tmp_path / "behaviors.tsv")
    shutil.copy(src, dst)
    gather_same_user_impr(dst)
    uids = [l.split("\t")[1] for l in open(dst, encoding="utf-8")]
    assert len(uids) == len(set(uids))  # one record per user now


def test_token_reducers():
    tokens = np.array([[2, 5, 5, 7, 0, 0]], dtype=np.int32)
    attn = np.array([[1, 1, 1, 1, 0, 0]], dtype=np.uint8)
    t2, a2 = Truncate(4)(tokens, attn)
    assert t2.shape == (1, 4)
    t3, a3 = DeDuplicate(6, backend="word")(tokens, attn)
    assert a3[0, 2] == 0          # duplicate 5 masked
    assert a3[0, 1] == 1 and a3[0, 3] == 1
    t4, a4 = CountFreq(4)(tokens, attn)
    assert t4.shape == (1, 4, 2)
    assert t4[0, 1, 0] == 5 and t4[0, 1, 1] == 2  # token 5 freq 2
