"""Serving API: checkpoint load, table reuse, ranking consistency."""
import os

import numpy as np
import pytest

from news_recommendation_mind_tpu.config import Config
from news_recommendation_mind_tpu.experiment import (
    build_data, build_eval_loaders, build_model, build_train_loader,
)
from news_recommendation_mind_tpu.serving import Recommender
from news_recommendation_mind_tpu.train import Trainer


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp("serve"))
    cfg = Config(scale="synthetic", data_root=os.path.join(tmp, "data"),
                 cache_root=os.path.join(tmp, "cache"),
                 ckpt_root=os.path.join(tmp, "ckpt"),
                 result_root=os.path.join(tmp, "results"),
                 batch_size=16, his_size=10, signal_length=12,
                 hidden_dim=32, embedding_dim=32, head_num=4,
                 epochs=1, lr=1e-3, dtype="float32", encoderU="attn",
                 interval=1000,
                 # serving tests exercise checkpoint->scorer plumbing, not
                 # sharding (dedicated tests + dryrun cover that); a
                 # 1-device mesh keeps this long fixture free of XLA:CPU
                 # in-process collectives (the full-suite SIGABRT path,
                 # ARCHITECTURE.md "Suite-stability campaign")
                 mesh_shape=(1,))
    data = build_data(cfg)
    model = build_model(cfg, data.vocab_size, data.user_num)
    loader = build_train_loader(cfg, data)
    news_loader, eval_loader = build_eval_loaders(cfg, data)
    trainer = Trainer(cfg, model, loader, news_loader, eval_loader)
    metrics = trainer.train()
    return cfg, metrics


@pytest.mark.slow
def test_recommender_ranks_preferred_topics(trained):
    cfg, metrics = trained
    rec = Recommender(cfg)
    # synthetic generator: N0..: topic words in the title; build a user who
    # clicked only sports articles and check sports candidates rank high
    import re
    topics = {}
    with open(os.path.join(cfg.data_root,
                           "MINDsynthetic_dev/news.tsv")) as f:
        for line in f:
            nid, cat = line.split("\t")[:2]
            topics.setdefault(cat, []).append(nid)
    cats = sorted(topics, key=lambda c: -len(topics[c]))[:2]
    liked, other = cats[0], cats[1]
    history = topics[liked][:8]
    candidates = topics[liked][8:11] + topics[other][:3]
    ranked = rec.rank(history, candidates)
    assert len(ranked) == 6
    top3 = {nid for nid, _ in ranked[:3]}
    liked_in_top = len(top3 & set(topics[liked][8:11]))
    assert liked_in_top >= 2, (ranked, metrics)
    # scores consistent between score() and rank()
    scores = rec.score(history, candidates)
    assert ranked[0][1] == pytest.approx(float(scores.max()))
    # unknown news ids degrade gracefully (pad article, low info)
    out = rec.score(history, ["UNKNOWN1", candidates[0]])
    assert out.shape == (2,)

    # retrieve() = candidate generation over the WHOLE corpus; ranking
    # must agree exactly with brute-force score() over every article
    all_nids = [rec.idx2nid[i] for i in range(1, rec.table.shape[0])]
    got = rec.retrieve(history, k=10, exclude_history=False)
    scores = rec.score(history, all_nids)
    order = np.argsort(-scores, kind="stable")[:10]
    assert [n for n, _ in got] == [all_nids[i] for i in order]
    assert [s for _, s in got] == pytest.approx(scores[order].tolist(),
                                                rel=1e-5)
    # history exclusion drops clicked items but still returns k results
    got_ex = rec.retrieve(history, k=10, exclude_history=True)
    assert len(got_ex) == 10
    assert not (set(n for n, _ in got_ex) & set(history))
    # exclusion covers the FULL history, including items past his_size
    # (cfg.his_size=10), via the exact-width refetch fallback
    long_history = all_nids[:15]
    got_long = rec.retrieve(long_history, k=10, exclude_history=True)
    assert len(got_long) == 10
    assert not (set(n for n, _ in got_long) & set(long_history))
