"""Vectorized uniform negative sampling.

The reference samples negatives two ways:

- statically at dataset-build time with ``np.random.randint`` per interaction,
  with possible collisions against the positive
  (torchrecsys/dataset/dataset.py:56-64);
- dynamically per batch with a *Python* rejection loop
  ``while neg_id == pos_id`` — the CPU hot spot of its training loop
  (dataset.py:435-454).

Here both paths are single vectorized draws usable *inside* a jitted TPU
train step. Collision avoidance needs no rejection loop: draw
``r ~ U[0, n-1)`` and shift past the positive (``neg = r + (r >= pos)``),
which is exactly uniform over the catalog minus the positive.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def sample_negatives(
    key: jax.Array,
    pos_items: jax.Array,
    num_items: int,
    avoid_collisions: bool = True,
) -> jax.Array:
    """Draw one uniform negative item per positive.

    Args:
      key: PRNG key.
      pos_items: (B,) int32 positive item rows.
      num_items: catalog size.
      avoid_collisions: if True, negatives are exactly uniform over the
        catalog *excluding* each row's positive (the reference's dynamic-mode
        contract, dataset.py:440-445); if False, plain uniform draws that may
        collide (the reference's static-mode contract, dataset.py:56-64).

    Returns:
      (B,) int32 negative item rows.
    """
    shape = pos_items.shape
    if avoid_collisions and num_items > 1:
        r = jax.random.randint(key, shape, 0, num_items - 1, dtype=jnp.int32)
        return r + (r >= pos_items).astype(jnp.int32)
    return jax.random.randint(key, shape, 0, num_items, dtype=jnp.int32)


def sample_negatives_np(
    rng: np.random.Generator,
    pos_items: np.ndarray,
    num_items: int,
    avoid_collisions: bool = False,
) -> np.ndarray:
    """Host-side (numpy) variant for static dataset-build-time sampling."""
    if avoid_collisions and num_items > 1:
        r = rng.integers(0, num_items - 1, size=pos_items.shape, dtype=np.int32)
        return r + (r >= pos_items).astype(np.int32)
    return rng.integers(0, num_items, size=pos_items.shape, dtype=np.int32)
