"""Synthetic MIND-format dataset generator.

Emits ``news.tsv`` / ``behaviors.tsv`` files byte-compatible with the real
MIND layout (the same parsers consume both), with a *learnable* topic
signal: each user prefers a couple of topics, titles are drawn from
topic-specific word distributions, and clicks follow the user's topic
preference. A model that learns content→topic and history→preference beats
AUC 0.5 by a wide margin, which gives tests and benchmarks a ground-truth
learning signal in this zero-egress environment (no MIND download).

MIND file formats (mirrored from reference utils/MIND.py:111-274):
- news.tsv:      nid \t category \t subcategory \t title \t abstract \t url
                 \t title_entities \t abstract_entities
- behaviors.tsv: impr_id \t uid \t time \t history(space-sep nids)
                 \t impressions("nid-label" space-sep; no label for test)
"""
from __future__ import annotations

import os
from typing import List

import numpy as np

_TOPIC_NAMES = [
    "news", "sports", "finance", "travel", "lifestyle", "video", "foodanddrink",
    "weather", "autos", "health", "music", "tv", "movies", "entertainment",
    "kids", "middleeast", "northamerica", "games", "europe", "science",
]


def generate_synthetic_mind(
    root: str,
    n_news: int = 400,
    n_users: int = 120,
    n_topics: int = 6,
    words_per_topic: int = 40,
    n_common_words: int = 60,
    title_len: int = 12,
    abstract_len: int = 20,
    history_len: int = 25,
    n_impressions_train: int = 600,
    n_impressions_dev: int = 200,
    n_impressions_test: int = 150,
    candidates_per_impr: int = 20,
    click_prob_pref: float = 0.85,
    click_prob_other: float = 0.05,
    seed: int = 0,
) -> dict:
    """Write MINDsynthetic_{train,dev,test} under `root`; return metadata."""
    rng = np.random.default_rng(seed)
    n_topics = min(n_topics, len(_TOPIC_NAMES))

    # topic-specific + shared vocabulary
    topic_words = [
        [f"{_TOPIC_NAMES[t]}word{i}" for i in range(words_per_topic)]
        for t in range(n_topics)
    ]
    common_words = [f"common{i}" for i in range(n_common_words)]

    news_topic = rng.integers(0, n_topics, n_news)

    def make_text(topic: int, length: int) -> str:
        words = []
        for _ in range(length):
            if rng.random() < 0.7:
                words.append(topic_words[topic][rng.integers(words_per_topic)])
            else:
                words.append(common_words[rng.integers(n_common_words)])
        return " ".join(words)

    nids = [f"N{i}" for i in range(n_news)]
    news_rows = []
    for i in range(n_news):
        t = int(news_topic[i])
        news_rows.append("\t".join([
            nids[i], _TOPIC_NAMES[t], f"{_TOPIC_NAMES[t]}sub",
            make_text(t, title_len), make_text(t, abstract_len),
            f"https://example.com/{nids[i]}", "[]", "[]",
        ]))

    # users prefer 2 topics
    user_prefs = rng.integers(0, n_topics, size=(n_users, 2))
    uids = [f"U{i}" for i in range(n_users)]
    topic_to_news = [np.where(news_topic == t)[0] for t in range(n_topics)]

    def user_history(u: int) -> List[str]:
        k = int(rng.integers(3, history_len))
        pools = np.concatenate([topic_to_news[t] for t in user_prefs[u]])
        return [nids[i] for i in rng.choice(pools, size=k)]

    histories = [user_history(u) for u in range(n_users)]

    def click(u: int, news_idx: int) -> int:
        p = (click_prob_pref if news_topic[news_idx] in user_prefs[u]
             else click_prob_other)
        return int(rng.random() < p)

    def make_behaviors(n_impr: int, labeled: bool) -> List[str]:
        rows = []
        for i in range(n_impr):
            u = int(rng.integers(n_users))
            cand = rng.choice(n_news, size=candidates_per_impr, replace=False)
            labels = [click(u, c) for c in cand]
            if labeled and sum(labels) == 0:       # ensure >=1 positive
                forced = int(rng.choice(
                    np.concatenate([topic_to_news[t] for t in user_prefs[u]])))
                cand[0], labels[0] = forced, 1
            if labeled and sum(labels) == len(labels):  # ensure >=1 negative
                labels[-1] = 0
            if labeled:
                imprs = " ".join(f"{nids[c]}-{l}" for c, l in zip(cand, labels))
            else:
                imprs = " ".join(nids[c] for c in cand)
            rows.append("\t".join([
                str(i + 1), uids[u], "11/11/2019 11:11:11 AM",
                " ".join(histories[u]), imprs,
            ]))
        return rows

    splits = {
        "train": make_behaviors(n_impressions_train, True),
        "dev": make_behaviors(n_impressions_dev, True),
        "test": make_behaviors(n_impressions_test, False),
    }
    for split, behaviors in splits.items():
        d = os.path.join(root, f"MINDsynthetic_{split}")
        os.makedirs(d, exist_ok=True)
        with open(os.path.join(d, "news.tsv"), "w", encoding="utf-8") as f:
            f.write("\n".join(news_rows) + "\n")
        with open(os.path.join(d, "behaviors.tsv"), "w", encoding="utf-8") as f:
            f.write("\n".join(behaviors) + "\n")

    return {
        "n_news": n_news,
        "n_users": n_users,
        "n_topics": n_topics,
        "news_topic": news_topic,
        "user_prefs": user_prefs,
        "root": root,
    }
