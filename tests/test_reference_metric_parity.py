"""Machine-checked metric parity against the ACTUAL reference code.

When the reference checkout is present (as in the dev environment at
/root/reference), its metric functions (utils/Manager.py:1205-1345) and
result grouping (utils/utils.py:60-80) are exec'd from source — not
copied — and compared with ours on randomized impression sets. Skipped
cleanly when the reference tree is absent (CI / standalone checkouts).
"""
import os
import re

import numpy as np
import pytest

from news_recommendation_mind_tpu.evaluation.metrics import (
    cal_metric, group_lists,
)

REF = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference checkout not available")


@pytest.fixture(scope="module")
def ref_ns():
    """Exec the reference's metric + grouping functions into a namespace."""
    from sklearn.metrics import (accuracy_score, f1_score, log_loss,
                                 mean_squared_error, roc_auc_score)

    from collections import defaultdict

    ns = {"np": np, "roc_auc_score": roc_auc_score,
          "mean_squared_error": mean_squared_error, "log_loss": log_loss,
          "accuracy_score": accuracy_score, "f1_score": f1_score,
          "defaultdict": defaultdict}
    src = open(os.path.join(REF, "utils", "Manager.py")).read()
    # slice out the module-level metric functions (no torch dependency)
    m = re.search(r"^def mrr_score.*", src, re.M | re.S)
    exec(compile(m.group(0), "ref_metrics", "exec"), ns)
    usrc = open(os.path.join(REF, "utils", "utils.py")).read()
    g = re.search(r"^def _group_lists.*?(?=^def )", usrc, re.M | re.S)
    exec(compile(g.group(0), "ref_group", "exec"), ns)
    return ns


def _random_impressions(rng, n=40):
    labels, preds = [], []
    for _ in range(n):
        k = int(rng.integers(2, 30))
        lab = np.zeros(k, np.float32)
        lab[rng.integers(0, k, size=max(1, int(rng.integers(1, 4))))] = 1.0
        if lab.sum() == 0 or lab.sum() == k:
            lab[0] = 1.0
            lab[1] = 0.0
        labels.append(lab.tolist())
        preds.append(rng.random(k).tolist())
    return labels, preds


def test_cal_metric_matches_reference(ref_ns):
    rng = np.random.default_rng(0)
    labels, preds = _random_impressions(rng)
    metrics = ["auc", "mean_mrr", "ndcg@5;10", "hit@5;10"]
    ours = cal_metric(labels, preds, metrics)
    # hit@k: the reference's `np.where(y_true == 1)` silently yields
    # "no hits" for list-typed labels (its default metric set never
    # exercises hit) — compare against the intended array semantics
    np_labels = [np.asarray(l) for l in labels]
    np_preds = [np.asarray(s) for s in preds]
    theirs = ref_ns["cal_metric"](np_labels, np_preds, metrics)
    assert ours == theirs, (ours, theirs)


def test_group_lists_matches_reference(ref_ns):
    rng = np.random.default_rng(1)
    # chunked impressions arriving out of order, like sharded eval output
    impr_indexes, labels, preds = [], [], []
    for impr in rng.permutation(12):
        for _ in range(int(rng.integers(1, 3))):  # 1-2 chunks each
            k = int(rng.integers(1, 6))
            impr_indexes.append(int(impr))
            labels.append(rng.integers(0, 2, k).tolist())
            preds.append(rng.random(k).tolist())
    ours_labels, ours_preds = group_lists(impr_indexes, labels, preds)
    ref_labels, ref_preds = ref_ns["_group_lists"](impr_indexes, labels,
                                                   preds)
    assert [list(x) for x in ours_labels] == [list(x) for x in ref_labels]
    assert [list(x) for x in ours_preds] == [list(x) for x in ref_preds]


def test_prediction_ranks_match_scipy_rankdata():
    """write_predictions encodes ordinal ranks of descending score; the
    reference uses ss.rankdata(1 - score, 'ordinal')
    (utils/Manager.py:836-852) — verify the argsort realization is
    identical, ties included."""
    ss = pytest.importorskip("scipy.stats")
    rng = np.random.default_rng(5)
    for _ in range(30):
        k = int(rng.integers(1, 40))
        scores = rng.random(k)
        if k > 3:  # inject ties
            scores[1] = scores[0]
        order = np.argsort(1 - scores, kind="stable")
        ranks = np.empty(k, dtype=np.int64)
        ranks[order] = np.arange(1, k + 1)
        ref = ss.rankdata(1 - scores, method="ordinal").astype(np.int64)
        np.testing.assert_array_equal(ranks, ref)


def test_scalar_metrics_match_reference(ref_ns):
    """acc / f1 / logloss / rmse operate on flat label/pred lists."""
    rng = np.random.default_rng(7)
    labels = rng.integers(0, 2, 300).tolist()
    preds = rng.random(300).tolist()
    metrics = ["acc", "f1", "logloss", "rmse"]
    ours = cal_metric(labels, preds, metrics)
    theirs = ref_ns["cal_metric"](list(labels), list(preds), metrics)
    for k in metrics:
        np.testing.assert_allclose(ours[k], theirs[k], atol=1e-9), k
