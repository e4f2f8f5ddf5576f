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


def generate_synthetic_mind_large(
    root: str,
    scale_name: str = "largesynth",
    n_news: int = 121_000,
    n_news_train: int = 101_000,
    n_news_dev: int = 72_000,
    n_users: int = 870_000,
    n_topics: int = 18,
    words_per_topic: int = 60,
    n_common_words: int = 120,
    title_len: int = 12,
    abstract_len: int = 20,
    max_history: int = 50,
    n_impressions_train: int = 2_200_000,
    n_impressions_dev: int = 377_000,
    n_impressions_test: int = 300_000,
    click_prob_pref: float = 0.85,
    click_prob_other: float = 0.05,
    seed: int = 0,
) -> dict:
    """MINDlarge-*shaped* synthetic corpus (reference hardcodes the real
    dimensions at utils/Manager.py:874-914: 876,956 users, ~2.2M train
    behavior rows, ~377k dev impressions, 120,961 test news).

    Same learnable topic signal as ``generate_synthetic_mind`` but fully
    vectorized (numpy word/candidate sampling, chunked streaming writes)
    so generating ~2.9M behavior rows and 121k articles takes minutes,
    not hours. Candidate counts per impression follow a clipped lognormal
    (2..300, mean ≈ 37) matching real MIND's ragged impressions — this is
    what exercises the eval bucketing at scale. Splits see nested news
    subsets: train = first ``n_news_train`` ids, dev = first
    ``n_news_dev``, test = all ``n_news``.

    Writes ``MIND{scale_name}_{train,dev,test}/{news,behaviors}.tsv``.
    """
    rng = np.random.default_rng(seed)
    n_topics = min(n_topics, len(_TOPIC_NAMES))

    vocab = np.array(
        [f"{_TOPIC_NAMES[t]}word{i}" for t in range(n_topics)
         for i in range(words_per_topic)]
        + [f"common{i}" for i in range(n_common_words)])
    n_topic_words = n_topics * words_per_topic

    news_topic = rng.integers(0, n_topics, n_news)

    def make_texts(length: int) -> np.ndarray:
        """[n_news] array of strings, 70% topic words / 30% common."""
        topical = rng.random((n_news, length)) < 0.7
        widx = np.where(
            topical,
            news_topic[:, None] * words_per_topic
            + rng.integers(0, words_per_topic, (n_news, length)),
            n_topic_words + rng.integers(0, n_common_words,
                                         (n_news, length)))
        words = vocab[widx]
        return np.array([" ".join(row) for row in words])

    titles = make_texts(title_len)
    abstracts = make_texts(abstract_len)
    nids = np.array([f"N{i}" for i in range(n_news)])
    cats = np.array(_TOPIC_NAMES)[news_topic]

    # users prefer 2 topics; history = ids drawn from preferred topics
    user_prefs = rng.integers(0, n_topics, size=(n_users, 2))
    topic_pools = [np.where(news_topic[:n_news_train] == t)[0]
                   for t in range(n_topics)]
    pool_sizes = np.array([max(len(p), 1) for p in topic_pools])
    pools_flat = np.concatenate(
        [p if len(p) else np.array([1]) for p in topic_pools])
    pool_offsets = np.concatenate(
        [[0], np.cumsum([max(len(p), 1) for p in topic_pools])[:-1]])

    his_lens = rng.integers(3, max_history + 1, n_users)
    total_his = int(his_lens.sum())
    his_user = np.repeat(np.arange(n_users), his_lens)
    his_topic = user_prefs[his_user, rng.integers(0, 2, total_his)]
    his_pos = (rng.random(total_his) * pool_sizes[his_topic]).astype(np.int64)
    his_ids = pools_flat[pool_offsets[his_topic] + his_pos]
    his_offsets = np.concatenate([[0], np.cumsum(his_lens)])
    # one history string per user, reused by every impression of that user
    hist_strings = [
        " ".join(nids[his_ids[his_offsets[u]:his_offsets[u + 1]]])
        for u in range(n_users)]

    def write_news(split: str, count: int) -> None:
        d = os.path.join(root, f"MIND{scale_name}_{split}")
        os.makedirs(d, exist_ok=True)
        with open(os.path.join(d, "news.tsv"), "w", encoding="utf-8") as f:
            for i in range(count):
                f.write("\t".join([
                    nids[i], cats[i], cats[i] + "sub", titles[i],
                    abstracts[i], f"https://example.com/{nids[i]}",
                    "[]", "[]"]) + "\n")

    def write_behaviors(split: str, n_impr: int, news_count: int,
                        labeled: bool, chunk: int = 50_000) -> None:
        d = os.path.join(root, f"MIND{scale_name}_{split}")
        os.makedirs(d, exist_ok=True)
        with open(os.path.join(d, "behaviors.tsv"), "w",
                  encoding="utf-8") as f:
            done = 0
            while done < n_impr:
                m = min(chunk, n_impr - done)
                users = rng.integers(0, n_users, m)
                # ragged candidate counts like real MIND impressions
                counts = np.clip(rng.lognormal(3.0, 0.9, m), 2,
                                 300).astype(np.int64)
                total = int(counts.sum())
                cand = rng.integers(0, news_count, total)
                row_of = np.repeat(np.arange(m), counts)
                pref = (news_topic[cand][:, None]
                        == user_prefs[users[row_of]]).any(1)
                p = np.where(pref, click_prob_pref, click_prob_other)
                labels = (rng.random(total) < p).astype(np.int64)
                offs = np.concatenate([[0], np.cumsum(counts)])
                for i in range(m):
                    lo, hi = offs[i], offs[i + 1]
                    c, l = cand[lo:hi], labels[lo:hi]
                    if labeled:
                        if l.sum() == 0:
                            # force one on-topic positive (learnable rows)
                            t = user_prefs[users[i], 0]
                            c[0] = pools_flat[
                                pool_offsets[t]
                                + int(rng.random() * pool_sizes[t])]
                            l[0] = 1
                        if l.sum() == len(l):
                            l[-1] = 0
                        imprs = " ".join(f"N{cj}-{lj}"
                                         for cj, lj in zip(c, l))
                    else:
                        imprs = " ".join(f"N{cj}" for cj in c)
                    f.write("\t".join([
                        str(done + i + 1), f"U{users[i]}",
                        "11/11/2019 11:11:11 AM",
                        hist_strings[users[i]], imprs]) + "\n")
                done += m

    write_news("train", n_news_train)
    write_news("dev", n_news_dev)
    write_news("test", n_news)
    write_behaviors("train", n_impressions_train, n_news_train, True)
    write_behaviors("dev", n_impressions_dev, n_news_dev, True)
    write_behaviors("test", n_impressions_test, n_news, False)
    return {"n_news": n_news, "n_users": n_users,
            "scale_name": scale_name, "root": root}
