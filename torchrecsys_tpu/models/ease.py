"""EASE — closed-form linear autoencoder (Steck 2019).

Reference: torchrecsys/collaborative/ease.py:33-85, which is legacy/unwired
(no ``'ease'`` branch in the facade, torchrecsys/model.py:127) and depends on
a dataset object that no longer exists. Rebuilt here as a first-class,
reachable model: build the user x item interaction matrix ``X``, solve
``P = (X^T X + lambda I)^-1``, ``B = -P / diag(P)`` with ``diag(B) = 0``
(ease.py:51-59), and score users by ``X[u] @ B`` (ease.py:62).

TPU notes: the Gram matrix ``X^T X`` is computed by a dense
``(I, U) @ (U, I)`` matmul built from segment-sum one-hot accumulation —
MXU-friendly and O(I^2) memory, appropriate for catalogs up to ~30-50K items
(the dense inverse is O(I^3), same asymptotics as the reference). The solve
uses ``jnp.linalg.solve`` in float32.

EASE has no gradient training, so it does not subclass
:class:`~torchrecsys_tpu.models.base.RecModel`; it exposes ``fit`` /
``scores`` / ``predict`` / ``get_similarity`` directly.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=("num_users", "num_items"))
def _interaction_matrix(
    users: jnp.ndarray, items: jnp.ndarray, num_users: int, num_items: int
) -> jnp.ndarray:
    x = jnp.zeros((num_users, num_items), jnp.float32)
    return x.at[users, items].max(1.0)


@jax.jit
def _solve_ease(x: jnp.ndarray, lam: float) -> jnp.ndarray:
    g = x.T @ x  # (I, I) Gram — MXU matmul (ease.py:51)
    g = g + lam * jnp.eye(g.shape[0], dtype=g.dtype)
    p = jnp.linalg.inv(g)  # ease.py:55
    b = -p / jnp.diag(p)[None, :]  # ease.py:56-58
    return b * (1.0 - jnp.eye(b.shape[0], dtype=b.dtype))  # diag(B)=0, ease.py:59


class EASE:
    def __init__(self, num_users: int, num_items: int, lam: float = 100.0) -> None:
        self.num_users = num_users
        self.num_items = num_items
        self.lam = lam
        self.x: Optional[jnp.ndarray] = None
        self.b: Optional[jnp.ndarray] = None

    def fit(self, users: np.ndarray, items: np.ndarray) -> "EASE":
        """users/items: (N,) encoded interaction rows (implicit feedback)."""
        self.x = _interaction_matrix(
            jnp.asarray(users, jnp.int32),
            jnp.asarray(items, jnp.int32),
            self.num_users,
            self.num_items,
        )
        self.b = _solve_ease(self.x, self.lam)
        return self

    def scores(self, user_ids: np.ndarray) -> jnp.ndarray:
        """(B,) users -> (B, num_items) scores = X[u] @ B (ease.py:62)."""
        if self.b is None:
            raise RuntimeError("EASE.scores requires a solve — call fit() first")
        return self.x[jnp.asarray(user_ids, jnp.int32)] @ self.b

    def predict(
        self, user_id: int, top_k: int = 10, exclude_seen: bool = True
    ) -> np.ndarray:
        """Top-k item rows for one user (ease.py:65-72) with optional
        seen-item filtering (new capability)."""
        s = self.scores(np.asarray([user_id]))[0]
        if exclude_seen:
            s = jnp.where(self.x[user_id] > 0, -jnp.inf, s)
        _, idx = jax.lax.top_k(s, top_k)
        return np.asarray(idx)

    def get_similarity(self, item_id: int, top_k: int = 10) -> np.ndarray:
        """Top-k most similar items by B row weight (ease.py:75-85)."""
        if self.b is None:
            raise RuntimeError(
                "EASE.get_similarity requires a solve — call fit() first"
            )
        _, idx = jax.lax.top_k(self.b[item_id], top_k)
        return np.asarray(idx)
