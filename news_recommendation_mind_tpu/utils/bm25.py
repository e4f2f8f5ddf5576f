"""BM25 scoring and inverted-index recall support.

Capability parity with the reference's recall machinery
(reference utils/utils.py:219-410): word-level ``BM25`` reorders each
article's words by BM25 score (used to build recall-ordered token caches),
token-level ``BM25Token`` scores cached token ids, and
``construct_inverted_index`` materialises a dense [vocab, top_k, 2]
token→(doc, score) table (numpy instead of a torch tensor). All of it is
host-side, offline tooling — nothing here touches the device path.
"""
from __future__ import annotations

import math
import os
import re
from collections import defaultdict
from typing import Dict, List, Sequence

import numpy as np

_PUNC_RE = re.compile(r"[.&*()+=/\\<>,!?;:~`@#$%^]")


class BM25:
    """Word-level BM25: reorder each document's words by score.

    b=0 (document length ignored), k=2 like the reference
    (utils/utils.py:344-410). Document 0 (the pad article) stays empty.
    """

    def __init__(self, k: float = 2.0, epsilon: float = 0.5):
        self.k = k
        self.epsilon = epsilon
        self.name = "bm25"

    def _build(self, documents: Sequence[str]):
        doc_count = len(documents)
        tfs = []
        df: Dict[str, int] = defaultdict(int)
        for document in documents:
            tf: Dict[str, int] = defaultdict(int)
            for word in _PUNC_RE.sub("", document).split():
                tf[word] += 1
                df[word] += 1
            tfs.append(tf)
        self.tfs = tfs
        self.idf = {w: math.log((doc_count - f + 0.5) / (f + 0.5) + 1)
                    for w, f in df.items()}

    def __call__(self, documents: Sequence[str]) -> List[str]:
        self._build(documents)
        out = []
        for i, tf in enumerate(self.tfs):
            if i == 0:
                out.append("")  # pad article
                continue
            scores = {w: (self.idf[w] * f * (self.k + 1)) / (f + self.k)
                      for w, f in tf.items()}
            ordered = sorted(scores, key=scores.get, reverse=True)
            out.append(" ".join(ordered))
        return out


class BM25Token:
    """Token-level BM25 over cached token-id documents
    (reference utils/utils.py:285-342)."""

    def __init__(self, documents: Sequence[Sequence[int]], k: float = 2.0,
                 epsilon: float = 0.5):
        self.name = "bm25-token"
        self.k = k
        self.epsilon = epsilon
        doc_count = len(documents)
        self.tfs = []
        df: Dict[int, int] = defaultdict(int)
        for document in documents:
            tf: Dict[int, int] = defaultdict(int)
            for token in document[1:]:  # strip [CLS]
                tf[int(token)] += 1
                df[int(token)] += 1
            self.tfs.append(tf)
        self.idf = {t: math.log((doc_count - f + 0.5) / (f + 0.5) + 1)
                    for t, f in df.items()}

    def __call__(self, token: int, doc_idx: int) -> float:
        tf = self.tfs[doc_idx].get(int(token), 0)
        return (self.idf.get(int(token), 0.0) * tf * (self.k + 1)) \
            / (tf + self.k)


def construct_inverted_index(corpus: Sequence[Sequence[int]], score_func,
                             vocab_size: int = 30522, top_k: int = 100,
                             special_ids=(0, 101, 102),
                             save_path: str | None = None) -> np.ndarray:
    """token → top_k (doc, score) pairs as a dense [vocab, top_k, 2] array.

    Absent tokens point at the padding doc index len(corpus) with score 0
    so they never recall anything (reference utils/utils.py:223-250).
    """
    inverted: Dict[int, list] = defaultdict(list)
    for i, document in enumerate(corpus):
        seen = set()
        for token in document:
            token = int(token)
            if token not in seen and token not in special_ids:
                inverted[token].append([i, score_func(token, i)])
                seen.add(token)

    padding = len(corpus)
    arr = np.zeros((vocab_size, top_k, 2), dtype=np.float64)
    arr[:, :, 0] = padding
    for token, postings in inverted.items():
        postings = sorted(postings, key=lambda x: x[1], reverse=True)[:top_k]
        postings = postings + [[padding, 0.0]] * (top_k - len(postings))
        arr[token] = np.asarray(postings)
    if save_path:
        os.makedirs(os.path.dirname(save_path), exist_ok=True)
        np.save(save_path, arr)
    return arr


def collate_recall(samples: Sequence[dict]) -> dict:
    """Stack a list of sample dicts into arrays, keeping cdd_* as lists
    (ragged recall candidates; reference utils/utils.py:205-215)."""
    result = defaultdict(list)
    for sample in samples:
        for k, v in sample.items():
            result[k].append(v)
    return {k: (v if "cdd" in k else np.asarray(v))
            for k, v in result.items()}
