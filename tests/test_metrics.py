"""Metric unit tests, including the reference's exact hit-rate case
(tests/test_metrics.py:6-25: expected 3/4)."""

import jax.numpy as jnp
import numpy as np

from torchrecsys_tpu.eval.metrics import (
    hit_rate,
    pairwise_auc,
    precision_recall_at_k,
    recall_at_k,
)


def test_hit_rate_reference_case():
    # mirror of the reference's hand-computed 4-row case: 3 of 4 rows hit
    y_true = jnp.asarray([[1, 2], [3, 4], [5, 6], [7, 8]])
    y_pred = jnp.asarray([[1, 9], [4, 9], [9, 9], [8, 9]])
    np.testing.assert_allclose(float(hit_rate(y_true, y_pred)), 3 / 4)


def test_pairwise_auc_exact():
    pos = jnp.asarray([1.0, 2.0, 0.0, 5.0])
    neg = jnp.asarray([0.0, 3.0, 0.0, 1.0])
    # wins: row0, row3; tie row2 counts as loss (strict >, metrics.py:23-31)
    np.testing.assert_allclose(float(pairwise_auc(pos, neg)), 2 / 4)


def test_recall_at_k():
    scores = jnp.asarray([[9.0, 1.0, 8.0, 0.0], [0.0, 9.0, 1.0, 8.0]])
    true_items = jnp.asarray([[0, 1], [1, 2]])
    # top2 row0 = {0,2}: hits {0} of {0,1} -> 0.5; row1 top2={1,3}: hits {1} -> 0.5
    np.testing.assert_allclose(float(recall_at_k(scores, true_items, 2)), 0.5)


def test_precision_recall_at_k():
    scores = jnp.asarray([[9.0, 8.0, 1.0, 0.0]])
    true_items = jnp.asarray([[0, 1, 2]])
    p, r = precision_recall_at_k(scores, true_items, 2)
    np.testing.assert_allclose(float(p), 1.0)  # both of top2 are true
    np.testing.assert_allclose(float(r), 2 / 3)


def test_recall_with_mask():
    scores = jnp.asarray([[9.0, 8.0, 1.0, 0.0]])
    true_items = jnp.asarray([[0, 3, 0]])  # padded row; only first 2 valid
    mask = jnp.asarray([[True, True, False]])
    r = recall_at_k(scores, true_items, 2, mask)
    np.testing.assert_allclose(float(r), 0.5)  # hits item 0, misses item 3
