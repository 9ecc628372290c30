"""Ranking metrics.

Reference analogs:
- ``Metrics.auc_score`` — per-batch pairwise win-rate with one sampled
  negative per positive, not full ROC-AUC
  (torchrecsys/evaluate/metrics.py:23-31). Reproduced exactly
  (strict ``pos > neg``; ties count as losses, matching the reference).
- ``Metrics.hit_rate`` — fraction of rows whose predicted id set intersects
  the true id set (evaluate/metrics.py:6-20).
- ``precision_recall_k`` — legacy dense-matrix precision/recall@k
  (torchrecsys/helper/evaluate.py:53-106), rebuilt on ``jax.lax.top_k``.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp


def pairwise_auc(pos_scores: jnp.ndarray, neg_scores: jnp.ndarray) -> jnp.ndarray:
    """mean(pos > neg) — evaluate/metrics.py:23-31."""
    return jnp.mean((pos_scores > neg_scores).astype(jnp.float32))


def hit_rate(y_true: jnp.ndarray, y_pred: jnp.ndarray) -> jnp.ndarray:
    """Fraction of rows with >= 1 overlap between true and predicted ids.

    y_true: (B, T) true item ids; y_pred: (B, K) predicted item ids.
    Broadcast membership test, as in evaluate/metrics.py:6-20.
    """
    hits = (y_true[:, :, None] == y_pred[:, None, :]).any(axis=(1, 2))
    return jnp.mean(hits.astype(jnp.float32))


def recall_at_k(
    scores: jnp.ndarray, true_items: jnp.ndarray, k: int, true_mask: jnp.ndarray = None
) -> jnp.ndarray:
    """Recall@k from a dense (B, num_items) score matrix.

    true_items: (B, T) item ids (padded); true_mask: (B, T) valid flags.
    """
    _, topk = jax.lax.top_k(scores, k)  # (B, k)
    hit = (true_items[:, :, None] == topk[:, None, :]).any(axis=-1)  # (B, T)
    if true_mask is None:
        true_mask = jnp.ones_like(true_items, bool)
    m = true_mask.astype(jnp.float32)
    per_row = jnp.sum(hit.astype(jnp.float32) * m, axis=1) / jnp.maximum(
        jnp.sum(m, axis=1), 1.0
    )
    return jnp.mean(per_row)


def precision_recall_at_k(
    scores: jnp.ndarray, true_items: jnp.ndarray, k: int, true_mask: jnp.ndarray = None
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Precision@k and recall@k from a dense score matrix
    (legacy parity: helper/evaluate.py:53-106, argsort replaced by top_k)."""
    _, topk = jax.lax.top_k(scores, k)
    if true_mask is None:
        true_mask = jnp.ones_like(true_items, bool)
    hit = (true_items[:, :, None] == topk[:, None, :]) & true_mask[:, :, None]
    hits_per_row = jnp.sum(hit.any(axis=1).astype(jnp.float32), axis=1)  # (B,)
    n_true = jnp.maximum(jnp.sum(true_mask.astype(jnp.float32), axis=1), 1.0)
    precision = jnp.mean(hits_per_row / k)
    recall = jnp.mean(hits_per_row / n_true)
    return precision, recall
