"""Pairwise ranking losses.

The reference trains exclusively with a margin-1 pairwise hinge loss
``mean(clamp(neg - pos + 1, 0))`` (torchrecsys/helper/loss.py:5-8). That loss
is reproduced exactly (with configurable margin), plus standard implicit-
feedback alternatives as new capabilities:

- ``bpr`` / ``logistic`` — classic one-negative losses;
- ``adaptive_hinge`` — hinge against the HIGHEST-scoring of K sampled
  negatives (the WARP approximation popularized by Spotlight); needs
  ``TrainConfig.num_negatives > 1`` to differ from plain hinge;
- ``warp`` — rank-weighted hinge (Weston, Bengio & Usunier 2011; the
  LightFM headline loss the reference family is known for but never
  implemented). The catalog rank of the positive is estimated from the K
  sampled negatives — ``rank ≈ floor((N-1) · violators/K)`` — and the
  violation is taken against the FIRST sampled violator (an unbiased
  stand-in for WARP's uniformly-sampled violator, since the K draws are
  iid), weighted by ``log(1 + rank)``. Exactly WARP's sequential-sampling
  estimate, computed from one batched draw instead of a data-dependent
  sampling loop — the TPU-shaped formulation (no dynamic control flow
  under ``jit``).

Every loss accepts negatives of shape ``(B,)`` (one per positive) or
``(K, B)`` (``num_negatives=K``; ``neg[k]`` is draw k for every row). The
one-negative losses average over K; with K=1 the two shapes agree exactly.

Per-row variants (``*_per_row``) return the ``(B,)`` unreduced rows and
satisfy ``mean(per_row(...)) == loss(...)`` — they carry the remainder-batch
masking weights in the train epoch and the chunked evaluation
(train/trainer.py).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp


def _neg2d(neg: jnp.ndarray) -> jnp.ndarray:
    """Normalize negatives to (K, B)."""
    return neg[None, :] if neg.ndim == 1 else neg


def hinge_per_row(pos: jnp.ndarray, neg: jnp.ndarray, margin: float = 1.0) -> jnp.ndarray:
    """clamp(neg - pos + margin, 0) — helper/loss.py:7 — mean over K draws."""
    return jnp.mean(jnp.maximum(_neg2d(neg) - pos + margin, 0.0), axis=0)


def bpr_per_row(pos: jnp.ndarray, neg: jnp.ndarray, margin: float = 0.0) -> jnp.ndarray:
    """Bayesian Personalized Ranking: -log sigmoid(pos - neg), mean over K."""
    del margin
    return -jnp.mean(jax.nn.log_sigmoid(pos - _neg2d(neg)), axis=0)


def logistic_per_row(pos: jnp.ndarray, neg: jnp.ndarray, margin: float = 0.0) -> jnp.ndarray:
    """Pointwise logistic: BCE with positives as 1, sampled negatives as 0."""
    del margin
    return -0.5 * (
        jax.nn.log_sigmoid(pos)
        + jnp.mean(jax.nn.log_sigmoid(-_neg2d(neg)), axis=0)
    )


def adaptive_hinge_per_row(
    pos: jnp.ndarray, neg: jnp.ndarray, margin: float = 1.0
) -> jnp.ndarray:
    """Hinge against the max-scoring sampled negative (Spotlight-style)."""
    return jnp.maximum(jnp.max(_neg2d(neg), axis=0) - pos + margin, 0.0)


def make_warp_per_row(
    num_items: int,
) -> Callable[[jnp.ndarray, jnp.ndarray, float], jnp.ndarray]:
    """WARP per-row loss bound to a catalog size (for the rank estimate)."""

    def warp_per_row(
        pos: jnp.ndarray, neg: jnp.ndarray, margin: float = 1.0
    ) -> jnp.ndarray:
        n2 = _neg2d(neg)
        k = n2.shape[0]
        viol = n2 + margin > pos  # (K, B) margin violations
        n_viol = jnp.sum(viol, axis=0)  # (B,)
        # Catalog-rank estimate from K iid uniform draws, floored like
        # WARP's floor((N-1)/trials): zero violators -> rank 0 -> weight 0.
        rank = jnp.floor((num_items - 1) * n_viol.astype(jnp.float32) / k)
        weight = jnp.log1p(rank)
        # First sampled violator ~ a uniformly-drawn violator (iid draws);
        # stop_gradient on the selection only (indices are ints anyway).
        first = jnp.argmax(viol, axis=0)  # (B,) — 0 when no violator
        chosen = jnp.take_along_axis(n2, first[None, :], axis=0)[0]
        any_viol = n_viol > 0
        hinge = jnp.maximum(chosen - pos + margin, 0.0)
        return jnp.where(any_viol, weight * hinge, 0.0)

    return warp_per_row


def _mean_of(per_row_fn):
    def loss(pos: jnp.ndarray, neg: jnp.ndarray, margin: float = 1.0) -> jnp.ndarray:
        return jnp.mean(per_row_fn(pos, neg, margin))

    return loss


hinge_loss = _mean_of(hinge_per_row)
hinge_loss.__doc__ = "mean(clamp(neg - pos + margin, 0)) — helper/loss.py:7."
bpr_loss = _mean_of(bpr_per_row)
logistic_loss = _mean_of(logistic_per_row)
adaptive_hinge_loss = _mean_of(adaptive_hinge_per_row)


LOSS_REGISTRY = {
    "hinge": hinge_loss,
    "bpr": bpr_loss,
    "logistic": logistic_loss,
    "adaptive_hinge": adaptive_hinge_loss,
    # "warp" resolves via get_per_row_loss/get_loss (needs num_items)
}


PER_ROW_LOSS_REGISTRY = {
    "hinge": hinge_per_row,
    "bpr": bpr_per_row,
    "logistic": logistic_per_row,
    "adaptive_hinge": adaptive_hinge_per_row,
}


def get_per_row_loss(name: str, num_items: Optional[int] = None):
    """Resolve a per-row loss by name; ``warp`` binds the catalog size."""
    if name == "warp":
        if num_items is None:
            raise ValueError("loss='warp' needs num_items for its rank estimate")
        return make_warp_per_row(num_items)
    try:
        return PER_ROW_LOSS_REGISTRY[name]
    except KeyError:
        raise ValueError(
            f"unknown loss {name!r}; expected one of "
            f"{sorted(PER_ROW_LOSS_REGISTRY) + ['warp']}"
        ) from None


def get_loss(name: str, num_items: Optional[int] = None):
    """Resolve a mean-reduced loss by name; ``warp`` binds the catalog size."""
    return _mean_of(get_per_row_loss(name, num_items))
