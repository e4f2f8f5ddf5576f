"""Impression-grouped ranking metrics.

Semantic parity with the reference metric stack
(reference utils/Manager.py:1205-1345): per-impression AUC / MRR / nDCG@k /
hit@k averaged over impressions, plus acc / f1 / logloss / rmse, and the
`impr_index` grouping helper (reference utils/utils.py:60-80). All metrics
are pure numpy — they run on host after scores are gathered from the
device(s); no sklearn dependency (AUC uses the exact Mann-Whitney rank
statistic, which equals `roc_auc_score` for binary labels including ties).
"""
from __future__ import annotations

from collections import defaultdict
from typing import Dict, Iterable, List, Optional, Sequence

import numpy as np


def _average_rank(x: np.ndarray) -> np.ndarray:
    """Average ranks (1-based) with ties sharing the mean rank."""
    order = np.argsort(x, kind="mergesort")
    ranks = np.empty(len(x), dtype=np.float64)
    sx = x[order]
    i = 0
    while i < len(sx):
        j = i
        while j + 1 < len(sx) and sx[j + 1] == sx[i]:
            j += 1
        ranks[order[i:j + 1]] = 0.5 * (i + j) + 1.0
        i = j + 1
    return ranks


def auc_score(y_true: np.ndarray, y_score: np.ndarray) -> float:
    """Binary ROC-AUC via the rank statistic (== sklearn.roc_auc_score)."""
    y_true = np.asarray(y_true, dtype=np.float64)
    y_score = np.asarray(y_score, dtype=np.float64)
    pos = y_true > 0
    n_pos = int(pos.sum())
    n_neg = int(len(y_true) - n_pos)
    if n_pos == 0 or n_neg == 0:
        raise ValueError("AUC undefined: impression has a single class")
    ranks = _average_rank(y_score)
    return float((ranks[pos].sum() - n_pos * (n_pos + 1) / 2.0)
                 / (n_pos * n_neg))


def mrr_score(y_true: np.ndarray, y_score: np.ndarray) -> float:
    """MRR over all positives (reference utils/Manager.py:1205-1223)."""
    y_true = np.asarray(y_true, dtype=np.float64)
    order = np.argsort(y_score)[::-1]
    y_sorted = np.take(y_true, order)
    rr = y_sorted / (np.arange(len(y_sorted)) + 1)
    return float(np.sum(rr) / np.sum(y_sorted))


def dcg_score(y_true: np.ndarray, y_score: np.ndarray, k: int = 10) -> float:
    """DCG@k with 2^rel-1 gains (reference utils/Manager.py:1258-1273)."""
    y_true = np.asarray(y_true, dtype=np.float64)
    k = min(np.shape(y_true)[-1], k)
    order = np.argsort(y_score)[::-1]
    y_top = np.take(y_true, order[:k])
    gains = 2 ** y_top - 1
    discounts = np.log2(np.arange(len(y_top)) + 2)
    return float(np.sum(gains / discounts))


def ndcg_score(y_true: np.ndarray, y_score: np.ndarray, k: int = 10) -> float:
    """nDCG@k (reference utils/Manager.py:1225-1237)."""
    best = dcg_score(y_true, y_true, k)
    actual = dcg_score(y_true, y_score, k)
    return float(actual / best)


def hit_score(y_true: np.ndarray, y_score: np.ndarray, k: int = 10) -> int:
    """hit@k: 1 iff any positive in top-k (reference utils/Manager.py:1240-1255)."""
    y_true = np.asarray(y_true)
    ground_truth = np.where(y_true == 1)[0]
    top = np.argsort(y_score)[::-1][:k]
    return int(bool(np.intersect1d(top, ground_truth).size))


def group_lists(impr_indexes: Sequence[int],
                *associated: Sequence[Sequence]) -> List[List[list]]:
    """Group per-chunk prediction/label lists by impression id.

    Eval emits impression *chunks* (an impression may be split across
    impr_size-sized pieces and across hosts); this re-joins them in
    first-seen order (reference utils/utils.py:60-80).
    """
    dicts = [defaultdict(list) for _ in associated]
    for row in zip(impr_indexes, *associated):
        key = row[0]
        for d, values in zip(dicts, row[1:]):
            d[key].extend(values)
    return [list(d.values()) for d in dicts]


def _chunk_metric_sums(L: np.ndarray, S: np.ndarray, lens_rows: np.ndarray,
                       want: Dict[str, list], acc) -> None:
    """Accumulate per-impression metric SUMS for one padded chunk.

    L: [m, W] labels (0 on pad), S: [m, W] scores (-inf on pad),
    lens_rows: [m] true widths. Shared by the list-of-groups and the
    flat (lengths + concatenated values) entry points so both are the
    same arithmetic in the same order.
    """
    import scipy.stats as ss

    W = L.shape[1]
    npos = L.sum(axis=1)
    if "auc" in want:
        ranks = ss.rankdata(S, method="average", axis=1)
        npad = (W - lens_rows).astype(np.float64)
        pos_rank_sum = np.where(L > 0, ranks, 0.0).sum(axis=1) \
            - npos * npad
        nneg = lens_rows - npos
        acc["auc"] += float(np.sum(
            (pos_rank_sum - npos * (npos + 1) / 2.0)
            / (npos * nneg)))
    if "mrr" in want or "ndcg" in want or "hit" in want:
        order = np.argsort(-S, axis=1, kind="stable")
        Ls = np.take_along_axis(L, order, axis=1)
        if "mrr" in want:
            rr = Ls / (np.arange(W, dtype=np.float64) + 1.0)
            acc["mrr"] += float(np.sum(rr.sum(axis=1) / npos))
        if "ndcg" in want:
            discounts = 1.0 / np.log2(np.arange(W) + 2.0)
            Lb = -np.sort(-L, axis=1)          # ideal ordering
            gains = (2.0 ** Ls - 1.0) * discounts
            best = (2.0 ** Lb - 1.0) * discounts
            for k in want["ndcg"]:
                kk = min(W, k)
                acc[f"ndcg@{k}"] += float(np.sum(
                    gains[:, :kk].sum(axis=1)
                    / best[:, :kk].sum(axis=1)))
        if "hit" in want:
            for k in want["hit"]:
                kk = min(W, k)
                acc[f"hit@{k}"] += float(np.sum(
                    (Ls[:, :kk] == 1).any(axis=1)))


def _grouped_metric_means(labels, preds, want: Dict[str, list],
                          chunk: int = 65536) -> Dict[str, float]:
    """Vectorized per-impression metric means over ragged groups.

    The scalar formulations above are the semantic reference (and what
    the reference-source parity tests pin); at MINDlarge scale their
    per-impression python loop costs ~46 s for 377k impressions, so the
    production path pads width-sorted row chunks and computes every
    requested metric with numpy/scipy row-wise ops — equality with the
    scalar loop is pinned by tests/test_metrics.py (exact for AUC
    including tied scores via the same average-rank statistic; for the
    order-based metrics ties are broken descending-stable, where the
    scalar loop inherits numpy's unspecified unstable-argsort tie order
    — the reference's own tie behavior is equally unspecified).

    ``want``: {"auc": [], "mrr": [], "ndcg": [k...], "hit": [k...]}.
    """
    n = len(labels)
    lens = np.fromiter((len(l) for l in labels), np.int64, n)
    row_order = np.argsort(lens, kind="stable")   # width bucketing
    acc = defaultdict(float)
    for start in range(0, n, chunk):
        rows = row_order[start:start + chunk]
        m = len(rows)
        W = int(lens[rows].max())
        L = np.zeros((m, W), np.float64)
        S = np.full((m, W), -np.inf, np.float64)
        for i, r in enumerate(rows):
            k = lens[r]
            L[i, :k] = labels[r]
            S[i, :k] = preds[r]
        _chunk_metric_sums(L, S, lens_rows=lens[rows], want=want, acc=acc)
    return {key: v / n for key, v in acc.items()}


def _segment_gather_indices(starts: np.ndarray,
                            lens: np.ndarray) -> np.ndarray:
    """Flat gather indices for variable-length segments.

    Returns idx with ``idx[out_pos] = source position`` such that
    ``flat[idx]`` lays the segments (starts[i], lens[i]) out back to
    back in the given row order — the repeat/cumsum trick that replaces
    per-segment python slicing everywhere in the flat eval pipeline.
    """
    total = int(lens.sum())
    if total == 0:
        return np.zeros(0, np.int64)
    out_starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
    return np.repeat(starts - out_starts, lens) + np.arange(total,
                                                            dtype=np.int64)


def group_flat(impr_indexes: np.ndarray, lengths: np.ndarray,
               *flats: Optional[np.ndarray]):
    """Array-native impression grouping (the vectorized group_lists).

    Input: one row per eval chunk — its impression id, its candidate
    count, and the chunk values concatenated into flat arrays. Output:
    per-impression lengths ``glens`` (groups in FIRST-SEEN order, the
    dict order group_lists produces; reference utils/utils.py:60-80) and
    each flat array re-ordered so every impression's chunks sit
    contiguously in arrival order. ``None`` flats pass through (the
    unlabeled test split). Equality with group_lists is pinned by
    tests/test_metrics.py.
    """
    impr = np.asarray(impr_indexes, np.int64)
    lengths = np.asarray(lengths, np.int64)
    n = len(impr)
    if n == 0:
        return np.zeros(0, np.int64), [
            None if f is None else np.zeros(0) for f in flats]
    uniq, first_idx, inv = np.unique(impr, return_index=True,
                                     return_inverse=True)
    # np.unique sorts by value; rank groups by first occurrence instead
    order_groups = np.argsort(first_idx, kind="stable")
    rank = np.empty(len(uniq), np.int64)
    rank[order_groups] = np.arange(len(uniq), dtype=np.int64)
    gid = rank[inv]
    row_order = np.argsort(gid, kind="stable")  # arrival order kept per gid
    glens = np.bincount(gid, weights=lengths).astype(np.int64)
    starts = np.concatenate([[0], np.cumsum(lengths)[:-1]])
    idx = _segment_gather_indices(starts[row_order], lengths[row_order])
    return glens, [None if f is None else np.asarray(f)[idx] for f in flats]


def _grouped_metric_means_flat(glens: np.ndarray, flat_labels: np.ndarray,
                               flat_preds: np.ndarray,
                               want: Dict[str, list],
                               chunk: int = 65536) -> Dict[str, float]:
    """_grouped_metric_means on the flat representation — zero
    per-impression python. Same chunking, same row (width) order, same
    arithmetic via _chunk_metric_sums, so it is bit-identical to the
    list path on equal groups (pinned by tests/test_metrics.py)."""
    flat_labels = np.asarray(flat_labels, np.float64)
    flat_preds = np.asarray(flat_preds, np.float64)
    glens = np.asarray(glens, np.int64)
    n = len(glens)
    row_order = np.argsort(glens, kind="stable")   # width bucketing
    starts = np.concatenate([[0], np.cumsum(glens)[:-1]])
    acc = defaultdict(float)
    for start in range(0, n, chunk):
        rows = row_order[start:start + chunk]
        m = len(rows)
        lens_rows = glens[rows]
        W = int(lens_rows.max())
        idx = _segment_gather_indices(starts[rows], lens_rows)
        pad_mask = np.arange(W)[None, :] < lens_rows[:, None]
        L = np.zeros((m, W), np.float64)
        S = np.full((m, W), -np.inf, np.float64)
        L[pad_mask] = flat_labels[idx]
        S[pad_mask] = flat_preds[idx]
        _chunk_metric_sums(L, S, lens_rows=lens_rows, want=want, acc=acc)
    return {key: v / n for key, v in acc.items()}


def _parse_want(metrics: Sequence[str]) -> Dict[str, list]:
    """Parse the reference's metric strings (`ndcg@5;10` syntax,
    utils/Manager.py:1276-1345) into the vectorized-path want dict."""
    want: Dict[str, list] = {}
    for metric in metrics:
        if metric == "auc":
            want["auc"] = []
        elif metric == "mean_mrr":
            want["mrr"] = []
        elif metric.startswith("ndcg") or metric.startswith("hit"):
            ks = metric.split("@")
            kind = "ndcg" if metric.startswith("ndcg") else "hit"
            cur = want.setdefault(kind, [])
            for k in ([int(t) for t in ks[1].split(";")]
                      if len(ks) > 1 else [1, 2]):
                if k not in cur:
                    cur.append(k)
    return want


def cal_metric_flat(glens: np.ndarray, flat_labels: Optional[np.ndarray],
                    flat_preds: np.ndarray,
                    metrics: Sequence[str]) -> Dict[str, float]:
    """cal_metric on the flat (group lengths + concatenated values)
    representation produced by group_flat — the zero-per-impression-
    python production path. Same dispatch/rounding as cal_metric;
    equality with the list path is pinned by tests/test_metrics.py."""
    glens = np.asarray(glens, np.int64)
    if len(glens) == 0:
        return {}
    flat_preds = np.asarray(flat_preds, np.float64)
    if flat_labels is not None:
        flat_labels = np.asarray(flat_labels, np.float64)
    want = _parse_want(metrics)
    vec = (_grouped_metric_means_flat(glens, flat_labels, flat_preds, want)
           if want else {})
    res: Dict[str, float] = {}
    for metric in metrics:
        if metric == "auc":
            res["auc"] = round(vec["auc"], 4)
        elif metric == "mean_mrr":
            res["mean_mrr"] = round(vec["mrr"], 4)
        elif metric.startswith("ndcg") or metric.startswith("hit"):
            ks = metric.split("@")
            kind = "ndcg" if metric.startswith("ndcg") else "hit"
            k_list = ([int(t) for t in ks[1].split(";")]
                      if len(ks) > 1 else [1, 2])
            for k in k_list:
                res[f"{kind}@{k}"] = round(vec[f"{kind}@{k}"], 4)
        elif metric == "rmse":
            # flats are already the group-order concatenation the list
            # path builds, so sums run in the identical order
            res["rmse"] = float(np.sqrt(round(
                float(np.mean((flat_labels - flat_preds) ** 2)), 4)))
        elif metric == "logloss":
            p = np.clip(flat_preds, 1e-11, 1.0 - 1e-11)
            ll = -np.mean(flat_labels * np.log(p)
                          + (1 - flat_labels) * np.log(1 - p))
            res["logloss"] = round(float(ll), 4)
        elif metric == "acc":
            res["acc"] = round(float(np.mean(
                flat_labels == (flat_preds >= 0.5))), 4)
        elif metric == "f1":
            pb = (flat_preds >= 0.5).astype(np.float64)
            tp = float(np.sum((flat_labels == 1) & (pb == 1)))
            fp = float(np.sum((flat_labels == 0) & (pb == 1)))
            fn = float(np.sum((flat_labels == 1) & (pb == 0)))
            res["f1"] = round(2 * tp / max(2 * tp + fp + fn, 1e-12), 4)
        else:
            raise ValueError(f"unknown metric {metric}")
    return res


def cal_metric(labels: Iterable[np.ndarray], preds: Iterable[np.ndarray],
               metrics: Sequence[str],
               vectorized: bool = True) -> Dict[str, float]:
    """Compute the requested metrics over grouped impressions.

    Mirrors the reference's dispatch exactly, including the `ndcg@5;10` /
    `hit@k;k` syntax and 4-decimal rounding
    (reference utils/Manager.py:1276-1345).
    """
    labels = list(labels)
    preds = list(preds)
    if vectorized and labels:
        want = _parse_want(metrics)
        vec = _grouped_metric_means(labels, preds, want) if want else {}
        res: Dict[str, float] = {}
        for metric in metrics:
            if metric == "auc":
                res["auc"] = round(vec["auc"], 4)
            elif metric == "mean_mrr":
                res["mean_mrr"] = round(vec["mrr"], 4)
            elif metric.startswith("ndcg") or metric.startswith("hit"):
                ks = metric.split("@")
                kind = "ndcg" if metric.startswith("ndcg") else "hit"
                k_list = ([int(t) for t in ks[1].split(";")]
                          if len(ks) > 1 else [1, 2])
                for k in k_list:
                    res[f"{kind}@{k}"] = round(vec[f"{kind}@{k}"], 4)
            else:
                res.update(cal_metric(labels, preds, [metric],
                                      vectorized=False))
        return res
    res = {}
    for metric in metrics:
        if metric == "auc":
            res["auc"] = round(float(np.mean(
                [auc_score(l, p) for l, p in zip(labels, preds)])), 4)
        elif metric == "mean_mrr":
            res["mean_mrr"] = round(float(np.mean(
                [mrr_score(l, p) for l, p in zip(labels, preds)])), 4)
        elif metric == "rmse":
            flat_l = np.concatenate([np.asarray(l).ravel() for l in labels])
            flat_p = np.concatenate([np.asarray(p).ravel() for p in preds])
            res["rmse"] = float(np.sqrt(round(
                float(np.mean((flat_l - flat_p) ** 2)), 4)))
        elif metric == "logloss":
            flat_l = np.concatenate([np.asarray(l).ravel() for l in labels])
            flat_p = np.clip(
                np.concatenate([np.asarray(p).ravel() for p in preds]),
                1e-11, 1.0 - 1e-11)
            ll = -np.mean(flat_l * np.log(flat_p)
                          + (1 - flat_l) * np.log(1 - flat_p))
            res["logloss"] = round(float(ll), 4)
        elif metric == "acc":
            flat_l = np.concatenate([np.asarray(l).ravel() for l in labels])
            flat_p = (np.concatenate(
                [np.asarray(p).ravel() for p in preds]) >= 0.5)
            res["acc"] = round(float(np.mean(flat_l == flat_p)), 4)
        elif metric == "f1":
            flat_l = np.concatenate([np.asarray(l).ravel() for l in labels])
            flat_p = (np.concatenate(
                [np.asarray(p).ravel() for p in preds]) >= 0.5).astype(float)
            tp = float(np.sum((flat_l == 1) & (flat_p == 1)))
            fp = float(np.sum((flat_l == 0) & (flat_p == 1)))
            fn = float(np.sum((flat_l == 1) & (flat_p == 0)))
            f1 = 2 * tp / max(2 * tp + fp + fn, 1e-12)
            res["f1"] = round(f1, 4)
        elif metric.startswith("ndcg"):
            ks = metric.split("@")
            k_list = [int(t) for t in ks[1].split(";")] if len(ks) > 1 else [1, 2]
            for k in k_list:
                v = float(np.mean(
                    [ndcg_score(l, p, k) for l, p in zip(labels, preds)]))
                res[f"ndcg@{k}"] = round(v, 4)
        elif metric.startswith("hit"):
            ks = metric.split("@")
            k_list = [int(t) for t in ks[1].split(";")] if len(ks) > 1 else [1, 2]
            for k in k_list:
                v = float(np.mean(
                    [hit_score(l, p, k) for l, p in zip(labels, preds)]))
                res[f"hit@{k}"] = round(v, 4)
        else:
            raise ValueError(f"unknown metric {metric}")
    return res
