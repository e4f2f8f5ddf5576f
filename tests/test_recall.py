"""Recall (retrieval) evaluation: sparse/dense/hybrid (evaluation/recall.py).

The reference declares recall_type {s,d,sd} but ships no working recall
path (reference utils/Manager.py:52, 117-119); here each type must work
and the dense retriever must agree exactly with brute-force scoring.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from news_recommendation_mind_tpu.config import Config, parse_config
from news_recommendation_mind_tpu.data.cache import Behaviors
from news_recommendation_mind_tpu.data.loader import _pad_histories
from news_recommendation_mind_tpu.evaluation.recall import (
    dense_rank, recall_at_k, rrf_fuse,
)
from news_recommendation_mind_tpu.models import (
    TwoTower, make_news_encoder, make_user_encoder,
)

HIDDEN = 32
N_NEWS = 37          # deliberately not a multiple of anything
HIS_SIZE = 6


def _toy_behaviors(n_impr: int, rng) -> Behaviors:
    his_l, cdd_l, lab_l = [], [], []
    for _ in range(n_impr):
        his_l.append(rng.integers(1, N_NEWS + 1,
                                  rng.integers(1, 9)).astype(np.int32))
        cdd = rng.choice(np.arange(1, N_NEWS + 1), size=5, replace=False)
        cdd_l.append(cdd.astype(np.int32))
        lab = np.zeros(5, np.int32)
        lab[rng.integers(0, 5)] = 1
        lab_l.append(lab)

    def ragged(lists):
        offs = np.zeros(len(lists) + 1, np.int64)
        np.cumsum([len(x) for x in lists], out=offs[1:])
        return np.concatenate(lists), offs

    his_flat, his_offs = ragged(his_l)
    cdd_flat, cdd_offs = ragged(cdd_l)
    lab_flat, _ = ragged(lab_l)
    return Behaviors(mode="dev", impr_idx=np.arange(n_impr, dtype=np.int64),
                     uindex=np.zeros(n_impr, np.int32),
                     his_flat=his_flat, his_offsets=his_offs,
                     cdd_flat=cdd_flat, cdd_offsets=cdd_offs,
                     labels_flat=lab_flat)


@pytest.fixture(scope="module")
def toy_model():
    model = TwoTower(
        embedding=None,
        news_encoder=make_news_encoder("cnn", hidden_dim=HIDDEN,
                                       embedding_dim=HIDDEN, head_num=4,
                                       dropout_p=0.0, dtype=jnp.float32),
        user_encoder=make_user_encoder("attn", hidden_dim=HIDDEN,
                                       head_num=4, dtype=jnp.float32),
        hidden_dim=HIDDEN,
    )
    his_repr = jnp.zeros((1, HIS_SIZE, HIDDEN), jnp.float32)
    his_mask = jnp.ones((1, HIS_SIZE), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), his_repr, his_mask, None,
                        method=TwoTower.encode_user_from_reprs)
    return model, params


def test_dense_rank_matches_bruteforce(toy_model):
    """dense_rank (batched, padded, lax.top_k) == per-impression numpy
    argsort of user·tableᵀ with the model itself as the user-repr oracle."""
    model, params = toy_model
    rng = np.random.default_rng(3)
    table = rng.normal(size=(N_NEWS + 1, HIDDEN)).astype(np.float32)
    b = _toy_behaviors(11, rng)
    top_k = 9
    got = dense_rank(model, params, table, b, HIS_SIZE, top_k=top_k,
                     batch_size=4)
    assert len(got) == 11
    his_ids, his_mask = _pad_histories(b, HIS_SIZE, False)
    for i in range(len(b)):
        user = np.asarray(model.apply(
            params, jnp.asarray(table[his_ids[i]][None]),
            jnp.asarray(his_mask[i][None]), None,
            method=TwoTower.encode_user_from_reprs))[0, 0]
        scores = table @ user
        scores[0] = -np.inf
        want = np.argsort(-scores, kind="stable")[:top_k]
        np.testing.assert_array_equal(np.asarray(got[i]), want)


def test_bm25_rank_returns_only_retrieved_docs():
    """Zero-score filler and the pad article must not occupy recall slots
    (they would earn unearned RRF credit in the hybrid)."""
    from news_recommendation_mind_tpu.evaluation.recall import bm25_rank
    # 4 articles + pad row, position 0 = [CLS] (101) as in the token
    # cache (BM25Token strips it); token 7 appears only in docs 1 and 3
    news_tokens = np.array([[0, 0, 0], [101, 7, 2], [101, 3, 4],
                            [101, 7, 5], [101, 6, 8]], np.int32)
    b = Behaviors(mode="dev", impr_idx=np.array([0]),
                  uindex=np.zeros(1, np.int32),
                  his_flat=np.array([1], np.int32),
                  his_offsets=np.array([0, 1]),
                  cdd_flat=np.array([3], np.int32),
                  cdd_offsets=np.array([0, 1]),
                  labels_flat=np.array([1], np.int32))
    ranked = bm25_rank(news_tokens, b, top_k=100)[0]
    assert 0 not in ranked.tolist()
    # only docs sharing a history token (7 → {1,3}; 2 → {1}) are retrieved
    assert set(ranked.tolist()) == {1, 3}
    # an unrecognized backend raises instead of silently falling through
    # to scipy (advisor round-3 low: 'navite' typo defeated the explicit
    # backend='native' error contract)
    with pytest.raises(ValueError, match="unknown bm25 backend"):
        bm25_rank(news_tokens, b, top_k=100, backend="navite")


def test_recall_eval_invariant_to_impression_chunking(toy_model):
    """Chunks of one impression (same impr_idx, shared history) must be
    scored once with merged positives — recall cannot depend on impr_size
    (reference utils/MIND.py:225-226 chunking)."""
    from news_recommendation_mind_tpu.evaluation.recall import recall_eval
    model, params = toy_model
    rng = np.random.default_rng(7)
    table = rng.normal(size=(N_NEWS + 1, HIDDEN)).astype(np.float32)
    his = np.array([4, 9, 2], np.int32)
    whole = Behaviors(mode="dev", impr_idx=np.array([5]),
                      uindex=np.zeros(1, np.int32),
                      his_flat=his, his_offsets=np.array([0, 3]),
                      cdd_flat=np.array([1, 2, 3, 4], np.int32),
                      cdd_offsets=np.array([0, 4]),
                      labels_flat=np.array([1, 0, 0, 1], np.int32))
    split = Behaviors(mode="dev", impr_idx=np.array([5, 5]),
                      uindex=np.zeros(2, np.int32),
                      his_flat=np.concatenate([his, his]),
                      his_offsets=np.array([0, 3, 6]),
                      cdd_flat=np.array([1, 2, 3, 4], np.int32),
                      cdd_offsets=np.array([0, 2, 4]),
                      labels_flat=np.array([1, 0, 0, 1], np.int32))
    kw = dict(model=model, params=params, news_table=table,
              his_size=HIS_SIZE, ks=(5, 10))
    a = recall_eval("d", whole, np.zeros((N_NEWS + 1, 2), np.int32), **kw)
    b = recall_eval("d", split, np.zeros((N_NEWS + 1, 2), np.int32), **kw)
    assert a == b


def test_dense_rank_small_corpus_clamps_topk(toy_model):
    """top_k larger than the corpus must clamp, not crash lax.top_k."""
    model, params = toy_model
    rng = np.random.default_rng(5)
    table = rng.normal(size=(N_NEWS + 1, HIDDEN)).astype(np.float32)
    b = _toy_behaviors(3, rng)
    got = dense_rank(model, params, table, b, HIS_SIZE, top_k=1000,
                     batch_size=4)
    assert all(len(g) == N_NEWS + 1 for g in got)


def test_rrf_fuse_hand_computed():
    fused = rrf_fuse(np.array([1, 2, 3]), np.array([3, 4, 5]), top_k=5)
    # 3 appears in both (ranks 3 and 1) and wins; 2/4 tie at rank 2 →
    # broken by id
    np.testing.assert_array_equal(fused, [3, 1, 2, 4, 5])


def test_recall_at_k():
    ranked = [np.array([1, 2, 3, 4]), np.array([9, 8, 7, 6])]
    positives = [{2, 5}, set()]          # second impression has no positive
    out = recall_at_k(ranked, positives, ks=(2, 4))
    # impression 2 is skipped (no positives); impression 1 finds one of
    # its two positives in both cutoffs
    assert out == {"recall@2": 0.5, "recall@4": 0.5}


def test_rt_flag_forces_recall_mode():
    cfg = parse_config(["-rt", "d"])
    assert cfg.mode == "recall" and cfg.recall_type == "d"


@pytest.fixture(scope="module")
def recall_cfg(tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp("recall"))
    def make(**kw):
        base = dict(
            scale="synthetic", data_root=os.path.join(tmp, "data"),
            cache_root=os.path.join(tmp, "cache"),
            ckpt_root=os.path.join(tmp, "ckpt"),
            result_root=os.path.join(tmp, "results"),
            mode="recall", batch_size=16, his_size=6, signal_length=10,
            hidden_dim=32, embedding_dim=32, head_num=4, epochs=1,
            dtype="float32", interval=1000, device_gather=False)
        base.update(kw)
        return Config(**base)
    return make


@pytest.mark.parametrize("rt", ["d", "sd"])
def test_recall_mode_dense_and_hybrid(recall_cfg, rt):
    from news_recommendation_mind_tpu.cli.common import run
    result = run(recall_cfg(recall_type=rt))
    assert set(result) == {"recall@20", "recall@50", "recall@100"}
    assert all(0.0 <= v <= 1.0 for v in result.values())
    assert (result["recall@20"] <= result["recall@50"]
            <= result["recall@100"])


@pytest.mark.parametrize("backend", ["scipy", "auto"])
def test_bm25_rank_equals_scalar_formulation(backend):
    """CLAUDE.md exactness bar for the CSR-matmul vectorization of
    bm25_rank: on a random ragged corpus, the two-sparse-matmul path must
    equal a straightforward per-impression / per-distinct-token scalar
    loop over the same inverted index, including the deterministic tie
    rule (score desc, doc id asc) at every position — a small vocab
    forces shared tokens and exact score ties (round-2 VERDICT weak 3).
    Parametrized over backends so the native C++ kernel meets the same
    bar (on 'auto' it falls back to scipy where g++ is unavailable)."""
    from news_recommendation_mind_tpu.evaluation.recall import bm25_rank
    from news_recommendation_mind_tpu.utils.bm25 import (
        BM25Token, construct_inverted_index,
    )
    rng = np.random.default_rng(17)
    n_news, vocab_small = 60, 25          # tiny vocab → many ties
    # ragged corpus in the token-cache layout: row 0 = pad, position 0 =
    # [CLS] (101), random lengths, zero-padded tails
    S = 9
    news_tokens = np.zeros((n_news + 1, S), np.int32)
    for d in range(1, n_news + 1):
        ln = rng.integers(1, S)
        news_tokens[d, 0] = 101
        news_tokens[d, 1:1 + ln] = rng.integers(3, vocab_small, ln)
    n_impr = 40
    his_l = [rng.integers(1, n_news + 1,
                          rng.integers(1, 7)).astype(np.int32)
             for _ in range(n_impr)]
    offs = np.zeros(n_impr + 1, np.int64)
    np.cumsum([len(x) for x in his_l], out=offs[1:])
    b = Behaviors(mode="dev", impr_idx=np.arange(n_impr, dtype=np.int64),
                  uindex=np.zeros(n_impr, np.int32),
                  his_flat=np.concatenate(his_l), his_offsets=offs,
                  cdd_flat=np.array([1], np.int32),
                  cdd_offsets=np.array([0, 1]),
                  labels_flat=np.array([1], np.int32))

    for top_k in (3, 7, 100):             # below, at, and above corpus size
        got = bm25_rank(news_tokens, b, top_k=top_k, backend=backend)

        # straightforward formulation: same inverted index, scalar loops
        toks = [row[row != 0] for row in news_tokens]
        bm25 = BM25Token(toks)
        vmax = int(news_tokens.max()) + 1
        inv = construct_inverted_index(toks, bm25, vocab_size=vmax,
                                       top_k=top_k)
        for j in range(n_impr):
            distinct = set()
            for art in his_l[j]:
                distinct.update(int(t) for t in news_tokens[art]
                                if t != 0)
            scores = np.zeros(n_news + 2, np.float64)  # + padding doc col
            for t in sorted(distinct):
                for doc, w in inv[t]:
                    scores[int(doc)] += w
            scores = scores[:n_news + 1]
            scores[0] = 0.0
            # same order-independence rounding as bm25_rank: the CSR
            # matmul and this loop accumulate in different orders
            scores = np.round(scores, 9)
            ranked = sorted((d for d in range(n_news + 1)
                             if scores[d] > 0),
                            key=lambda d: (-scores[d], d))[:top_k]
            np.testing.assert_array_equal(
                np.asarray(got[j]), np.asarray(ranked, np.int64),
                err_msg=f"impression {j} top_k {top_k}")


def test_bm25_rank_native_equals_scipy():
    """Exactness pin for the native C++/OpenMP top-k kernel
    (native/bm25_topk.cpp) against the scipy CSR formulation on a larger
    randomized corpus: same inverted index, same round(9) tie rule, so
    the ranked lists must be bit-identical per impression. Includes
    empty histories, duplicate history articles, and a pad-article
    reference in a history (all must retrieve nothing extra)."""
    from news_recommendation_mind_tpu.evaluation.native_bm25 import (
        get_library,
    )
    from news_recommendation_mind_tpu.evaluation.recall import bm25_rank

    if get_library() is None:
        pytest.skip("no compiler for the native bm25 kernel")

    rng = np.random.default_rng(23)
    n_news, vocab_small, S = 300, 40, 12   # dense tie structure
    news_tokens = np.zeros((n_news + 1, S), np.int32)
    for d in range(1, n_news + 1):
        ln = rng.integers(1, S)
        news_tokens[d, 0] = 101
        news_tokens[d, 1:1 + ln] = rng.integers(3, vocab_small, ln)
    n_impr = 200
    his_l = []
    for j in range(n_impr):
        if j == 0:
            his_l.append(np.zeros(0, np.int32))          # empty history
        elif j == 1:
            his_l.append(np.array([0, 0], np.int32))     # pad-article only
        elif j == 2:
            his_l.append(np.array([5, 5, 5], np.int32))  # duplicates
        else:
            his_l.append(rng.integers(0, n_news + 1,
                                      rng.integers(1, 40)).astype(np.int32))
    offs = np.zeros(n_impr + 1, np.int64)
    np.cumsum([len(x) for x in his_l], out=offs[1:])
    b = Behaviors(mode="dev", impr_idx=np.arange(n_impr, dtype=np.int64),
                  uindex=np.zeros(n_impr, np.int32),
                  his_flat=(np.concatenate(his_l) if offs[-1] else
                            np.zeros(0, np.int32)),
                  his_offsets=offs,
                  cdd_flat=np.array([1], np.int32),
                  cdd_offsets=np.array([0, 1]),
                  labels_flat=np.array([1], np.int32))
    for top_k in (10, 100, 1000):
        want = bm25_rank(news_tokens, b, top_k=top_k, backend="scipy")
        got = bm25_rank(news_tokens, b, top_k=top_k, backend="native")
        assert len(got) == len(want)
        for j, (g, w) in enumerate(zip(got, want)):
            np.testing.assert_array_equal(
                np.asarray(g), np.asarray(w),
                err_msg=f"impression {j} top_k {top_k}")
