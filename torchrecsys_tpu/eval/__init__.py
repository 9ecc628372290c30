from torchrecsys_tpu.eval.metrics import (
    hit_rate,
    pairwise_auc,
    precision_recall_at_k,
    recall_at_k,
)
from torchrecsys_tpu.eval.predict import (
    catalog_topk,
    full_catalog_topk,
    ranking_eval,
    topk_ranking_metrics,
)

__all__ = [
    "pairwise_auc",
    "hit_rate",
    "recall_at_k",
    "precision_recall_at_k",
    "full_catalog_topk",
    "catalog_topk",
    "ranking_eval",
    "topk_ranking_metrics",
]
