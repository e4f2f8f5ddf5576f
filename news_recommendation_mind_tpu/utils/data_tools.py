"""Offline dataset construction and analysis utilities.

Capability parity with the reference's Manager dataset tooling
(reference utils/Manager.py:1029-1202) and utils.py helpers
(utils/utils.py:100-215, 413-522):

- id-map builders (nid2idx per scale/mode preserving news.tsv order,
  uid2idx across splits),
- MINDwhole construction (large_train + first 200k of large_dev),
- per-user impression gathering and sequential-history rewriting,
- corpus statistics,
- token reducers used by the cache build (DeDuplicate / CountFreq /
  Truncate / DoNothing).

All host-side, numpy/stdlib only.
"""
from __future__ import annotations

import json
import os
import pickle
from collections import defaultdict
from datetime import datetime
from typing import Dict, Iterable, List, Optional, Sequence

import numpy as np

_TIME_FMT = "%m/%d/%Y %X %p"

# token ids treated as punctuation by DeDuplicate, per embedding backend
# (reference utils/utils.py:437-448)
_PUNCTUATION_IDS = {
    "bert": {102, 999, 1001, 1002, 1003, 1004, 1005, 1006, 1007, 1008,
             1009, 1010, 1011, 1012, 1013, 1024, 1025, 1026, 1027, 1028,
             1029, 1030, 1031, 1032, 1033, 1034, 1035, 1036, 1066, 1529,
             1996},
    "deberta": {2, 10975, 4, 947, 3226, 1640, 43, 2744, 5214, 73, 37457,
                41552, 15698, 6, 328, 116, 131, 35, 34437, 12905, 1039,
                10431, 1629, 207, 35227, 742},
}


def get_id2idx(path: str) -> Dict[str, int]:
    """Load an id→index json map (reference utils/utils.py:193-200)."""
    with open(path, encoding="utf-8") as f:
        return json.load(f)


def construct_nid2idx(news_tsv: str, out_path: Optional[str] = None
                      ) -> Dict[str, int]:
    """News id → 1-based index preserving news.tsv order
    (reference utils/Manager.py:1029-1055)."""
    nid2idx: Dict[str, int] = {}
    with open(news_tsv, encoding="utf-8") as f:
        for line in f:
            nid = line.split("\t", 1)[0]
            if nid and nid not in nid2idx:
                nid2idx[nid] = len(nid2idx) + 1
    if out_path:
        os.makedirs(os.path.dirname(out_path), exist_ok=True)
        with open(out_path, "w", encoding="utf-8") as f:
            json.dump(nid2idx, f, ensure_ascii=False)
    return nid2idx


def construct_uid2idx(behavior_tsvs: Sequence[str],
                      out_path: Optional[str] = None) -> Dict[str, int]:
    """User id → 1-based index over all splits
    (reference utils/Manager.py:1058-1087)."""
    uid2idx: Dict[str, int] = {}
    for path in behavior_tsvs:
        if not os.path.exists(path):
            continue
        with open(path, encoding="utf-8") as f:
            for line in f:
                parts = line.rstrip("\n").split("\t")
                if len(parts) < 2:
                    continue
                uid = parts[1]
                if uid not in uid2idx:
                    uid2idx[uid] = len(uid2idx) + 1
    if out_path:
        os.makedirs(os.path.dirname(out_path), exist_ok=True)
        with open(out_path, "w", encoding="utf-8") as f:
            json.dump(uid2idx, f, ensure_ascii=False)
    return uid2idx


def construct_whole_dataset(data_root: str,
                            dev_train_split: int = 200000) -> None:
    """MINDwhole = large_train + first `dev_train_split` lines of
    large_dev; remainder becomes whole_dev
    (reference utils/Manager.py:1117-1166)."""
    large_train = os.path.join(data_root, "MINDlarge_train")
    large_dev = os.path.join(data_root, "MINDlarge_dev")
    whole_train = os.path.join(data_root, "MINDwhole_train")
    whole_dev = os.path.join(data_root, "MINDwhole_dev")
    os.makedirs(whole_train, exist_ok=True)
    os.makedirs(whole_dev, exist_ok=True)

    with open(os.path.join(whole_train, "behaviors.tsv"), "w") as tf, \
            open(os.path.join(whole_dev, "behaviors.tsv"), "w") as df:
        with open(os.path.join(large_train, "behaviors.tsv")) as f:
            for line in f:
                tf.write(line)
        with open(os.path.join(large_dev, "behaviors.tsv")) as f:
            for count, line in enumerate(f):
                (tf if count < dev_train_split else df).write(line)

    with open(os.path.join(whole_train, "news.tsv"), "w") as tf:
        for src in (large_train, large_dev):
            with open(os.path.join(src, "news.tsv")) as f:
                tf.write(f.read())
    with open(os.path.join(whole_dev, "news.tsv"), "w") as df, \
            open(os.path.join(large_dev, "news.tsv")) as f:
        df.write(f.read())


def gather_same_user_impr(behaviors_tsv: str,
                          out_path: Optional[str] = None) -> None:
    """Merge all of a user's impressions into one time-sorted record
    (reference utils/Manager.py:1168-1202). In-place when out_path=None."""
    behaviors = defaultdict(list)
    with open(behaviors_tsv, encoding="utf-8") as f:
        for line in f:
            rec = line.rstrip("\n").split("\t")
            behaviors[rec[1]].append(rec)
    rows = []
    for uid, recs in behaviors.items():
        recs.sort(key=lambda r: datetime.strptime(r[2], _TIME_FMT))
        merged = recs[0][:4] + [" ".join(r[4] for r in recs)]
        rows.append(merged)
    with open(out_path or behaviors_tsv, "w", encoding="utf-8") as f:
        for row in rows:
            f.write("\t".join(row) + "\n")


def construct_sequential_behaviors(split_dir: str) -> str:
    """Append each user's earlier clicks to later impressions' history,
    writing behaviors_sequential.tsv (reference utils/utils.py:100-137)."""
    behaviors = defaultdict(list)
    with open(os.path.join(split_dir, "behaviors.tsv"),
              encoding="utf-8") as f:
        for line in f:
            rec = line.rstrip("\n").split("\t")
            behaviors[rec[1]].append(rec)
    for uid, recs in behaviors.items():
        recs.sort(key=lambda r: datetime.strptime(r[2], _TIME_FMT))
        clicked: List[str] = []
        for i, rec in enumerate(recs):
            if i > 0 and clicked:
                rec[3] = (rec[3] + " " + " ".join(clicked)).strip()
            for token in rec[4].split():
                nid, _, label = token.rpartition("-")
                if label == "1":
                    clicked.append(nid)
    out = os.path.join(split_dir, "behaviors_sequential.tsv")
    with open(out, "w", encoding="utf-8") as f:
        for recs in behaviors.values():
            for rec in recs:
                f.write("\t".join(rec) + "\n")
    return out


def construct_cddidx_for_recall(imprs: Iterable[Sequence],
                                out_dir: str = "data/recall"
                                ) -> Dict[int, int]:
    """Map candidate news ids to a dense range for an ANN/faiss index
    (reference utils/Manager.py:1089-1113)."""
    os.makedirs(out_dir, exist_ok=True)
    news_set: set = set()
    for impr in imprs:
        news_set.update(int(x) for x in impr[1])
    ordered = sorted(news_set)
    np.save(os.path.join(out_dir, "news.npy"),
            np.asarray(ordered, dtype=np.int64))
    cddid2idx = {x: i for i, x in enumerate(ordered)}
    with open(os.path.join(out_dir, "cddid2idx_recall.pkl"), "wb") as f:
        pickle.dump(cddid2idx, f)
    return cddid2idx


def statistic_mind(split_dir: str) -> Dict[str, float]:
    """Corpus statistics for one MIND split
    (reference utils/utils.py:140-190)."""
    stats = dict(avg_title_length=0.0, avg_abstract_length=0.0,
                 avg_his_length=0.0, avg_impr_length=0.0,
                 cnt_his_lg_50=0, cnt_his_eq_0=0, cnt_imp_multi=0)
    count = 0
    with open(os.path.join(split_dir, "news.tsv"), encoding="utf-8") as f:
        for line in f:
            parts = line.rstrip("\n").split("\t")
            stats["avg_title_length"] += len(parts[3].split(" "))
            stats["avg_abstract_length"] += len(parts[4].split(" "))
            count += 1
    stats["avg_title_length"] /= max(count, 1)
    stats["avg_abstract_length"] /= max(count, 1)

    count = 0
    with open(os.path.join(split_dir, "behaviors.tsv"),
              encoding="utf-8") as f:
        for line in f:
            parts = line.rstrip("\n").split("\t")
            his = parts[3].split(" ")
            imp = parts[4].split(" ")
            stats["cnt_his_lg_50"] += len(his) > 50
            stats["cnt_imp_multi"] += len(imp) > 50
            stats["cnt_his_eq_0"] += not his[0]
            stats["avg_his_length"] += len(his)
            stats["avg_impr_length"] += len(imp)
            count += 1
    stats["avg_his_length"] /= max(count, 1)
    stats["avg_impr_length"] /= max(count, 1)
    return stats


# ---------------------------------------------------------------------------
# token reducers (cache-build post-processing, reference utils/utils.py:413-522)
# ---------------------------------------------------------------------------

class DoNothing:
    def __call__(self, tokens: np.ndarray, attn: np.ndarray):
        return tokens, attn


class Truncate:
    """Keep the first max_length tokens per article."""

    def __init__(self, max_length: int):
        self.max_length = max_length

    def __call__(self, tokens: np.ndarray, attn: np.ndarray):
        return tokens[:, :self.max_length], attn[:, :self.max_length]


class DeDuplicate:
    """Zero the attention mask of duplicated/punctuation tokens, then
    truncate (reference utils/utils.py:431-470)."""

    def __init__(self, max_length: int, backend: str = "bert",
                 remove_punctuation: bool = True):
        self.max_length = max_length
        self.punctuations = (_PUNCTUATION_IDS.get(backend, set())
                             if remove_punctuation else set())

    def __call__(self, tokens: np.ndarray, attn: np.ndarray):
        tokens = tokens[:, :self.max_length]
        attn = attn[:, :self.max_length].copy()
        for i in range(tokens.shape[0]):
            seen: set = set()
            for j, token in enumerate(tokens[i]):
                t = int(token)
                if t in seen or t in self.punctuations:
                    attn[i, j] = 0
                else:
                    seen.add(t)
        return tokens, attn


class CountFreq:
    """Token → (token, in-article frequency) pairs, deduplicated — the
    bag-of-words representation (reference utils/utils.py:473-514)."""

    def __init__(self, max_length: int):
        self.max_length = max_length

    def __call__(self, tokens: np.ndarray, attn: np.ndarray):
        n, _ = tokens.shape
        out = np.zeros((n, self.max_length, 2), dtype=tokens.dtype)
        out_attn = np.zeros((n, self.max_length), dtype=attn.dtype)
        for i in range(n):
            freq: Dict[int, int] = {}
            order: List[int] = []
            for token, a in zip(tokens[i], attn[i]):
                if not a:
                    continue
                t = int(token)
                if t not in freq:
                    freq[t] = 0
                    order.append(t)
                freq[t] += 1
            for j, t in enumerate(order[:self.max_length]):
                out[i, j, 0] = t
                out[i, j, 1] = freq[t]
                out_attn[i, j] = 1
        return out, out_attn
