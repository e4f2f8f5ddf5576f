from .metrics import (
    auc_score,
    cal_metric,
    dcg_score,
    group_lists,
    hit_score,
    mrr_score,
    ndcg_score,
)

__all__ = [
    "auc_score",
    "cal_metric",
    "dcg_score",
    "group_lists",
    "hit_score",
    "mrr_score",
    "ndcg_score",
]
