"""Pairwise ranking losses.

The reference trains exclusively with a margin-1 pairwise hinge loss
``mean(clamp(neg - pos + 1, 0))`` (torchrecsys/helper/loss.py:5-8). That loss
is reproduced exactly (with configurable margin), plus two standard implicit-
feedback alternatives (BPR and pointwise logistic) as new capabilities.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def hinge_loss(pos: jnp.ndarray, neg: jnp.ndarray, margin: float = 1.0) -> jnp.ndarray:
    """mean(clamp(neg - pos + margin, 0)) — helper/loss.py:7."""
    return jnp.mean(jnp.maximum(neg - pos + margin, 0.0))


def bpr_loss(pos: jnp.ndarray, neg: jnp.ndarray, margin: float = 0.0) -> jnp.ndarray:
    """Bayesian Personalized Ranking: -mean(log sigmoid(pos - neg))."""
    del margin
    return -jnp.mean(jax.nn.log_sigmoid(pos - neg))


def logistic_loss(pos: jnp.ndarray, neg: jnp.ndarray, margin: float = 0.0) -> jnp.ndarray:
    """Pointwise logistic: BCE with positives as 1 and sampled negatives as 0."""
    del margin
    return -0.5 * (
        jnp.mean(jax.nn.log_sigmoid(pos)) + jnp.mean(jax.nn.log_sigmoid(-neg))
    )


LOSS_REGISTRY = {
    "hinge": hinge_loss,
    "bpr": bpr_loss,
    "logistic": logistic_loss,
}


# Per-row variants (no mean reduction) — used by chunked evaluation and by
# the remainder-batch masking in the train epoch, where rows carry weights
# (see train/trainer.py). Each satisfies mean(per_row(...)) == loss(...).
def hinge_per_row(pos: jnp.ndarray, neg: jnp.ndarray, margin: float = 1.0) -> jnp.ndarray:
    return jnp.maximum(neg - pos + margin, 0.0)


def bpr_per_row(pos: jnp.ndarray, neg: jnp.ndarray, margin: float = 0.0) -> jnp.ndarray:
    del margin
    return -jax.nn.log_sigmoid(pos - neg)


def logistic_per_row(pos: jnp.ndarray, neg: jnp.ndarray, margin: float = 0.0) -> jnp.ndarray:
    del margin
    return -0.5 * (jax.nn.log_sigmoid(pos) + jax.nn.log_sigmoid(-neg))


PER_ROW_LOSS_REGISTRY = {
    "hinge": hinge_per_row,
    "bpr": bpr_per_row,
    "logistic": logistic_per_row,
}
