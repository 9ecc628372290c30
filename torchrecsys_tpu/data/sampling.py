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


def popularity_cdf(
    train_items: np.ndarray, num_items: int, alpha: float = 0.75
) -> np.ndarray:
    """(num_items,) f32 sampling CDF over item frequency^alpha.

    The word2vec-style smoothed-unigram negative distribution
    ``p(i) ∝ count(i)^alpha`` (Mikolov et al. 2013), built host-side once
    per store. ``alpha=0`` is uniform over OBSERVED items; never-interacted
    items get count 0 and are never drawn (they carry no ranking signal to
    push against). The CDF feeds :func:`sample_negatives_weighted`'s
    device-side ``searchsorted`` — no alias-table build, no host RNG in the
    step. No reference analog (uniform-only, dataset.py:56-64, 435-454).
    """
    w, total = _popularity_weights(train_items, num_items, alpha)
    return np.cumsum(w / total).astype(np.float32)


def _popularity_weights(
    train_items: np.ndarray, num_items: int, alpha: float
) -> "tuple[np.ndarray, float]":
    """Shared count^alpha weighting (with the degenerate-empty-split
    uniform fallback) behind both the CDF reference implementation and
    the alias builder — one place to change the smoothing rule."""
    counts = np.bincount(
        np.asarray(train_items, np.int64), minlength=num_items
    ).astype(np.float64)
    w = counts**alpha
    total = w.sum()
    if total <= 0:
        w = np.ones(num_items, np.float64)
        total = float(num_items)
    return w, total


def alias_table(
    train_items: np.ndarray, num_items: int, alpha: float = 0.75
) -> "tuple[np.ndarray, np.ndarray]":
    """Walker/Vose alias table for ``p(i) ∝ count(i)^alpha`` sampling.

    Built host-side once per store (O(N)); on device each draw is then
    O(1): one uniform slot, one uniform coin, two (N,)-table gathers
    (:func:`sample_negatives_alias`). This replaces inverse-CDF
    ``searchsorted`` in the train step: jnp.searchsorted's binary search
    lowers to ~log2(N) SEQUENTIAL gather rounds over the CDF, measured
    2.3x the whole 1-negative XLA train step at a 100K catalog — the alias
    method's two parallel gathers cost ~nothing.

    Returns ``(prob, alias, fallback)``: f32 (N,) acceptance probabilities,
    i32 (N,) alias slots, and the i32 (2,) most-popular-two items — the
    collision residue's escape hatch (see :func:`sample_negatives_alias`).
    Zero-count items get prob 0 in slots whose alias points at a popular
    item — they are never drawn, matching :func:`popularity_cdf` semantics.
    """
    w, total = _popularity_weights(train_items, num_items, alpha)
    scaled = w / total * num_items  # mean 1.0
    if num_items >= 2:
        # O(N) top-2 (a full argsort would rival the C++ Vose build's own
        # cost at 10M-item catalogs)
        top2 = np.argpartition(-w, 1)[:2].astype(np.int32)
        if w[top2[1]] > w[top2[0]]:
            top2 = top2[::-1].copy()
    else:
        top2 = np.zeros(2, np.int32)
    from torchrecsys_tpu import native

    built = native.alias_build(scaled)
    if built is not None:  # C++ Vose (native/ingest.cpp) — ~20x the loop
        return built[0], built[1], top2
    prob = np.ones(num_items, np.float64)
    alias = np.arange(num_items, dtype=np.int64)
    small = [i for i in range(num_items) if scaled[i] < 1.0]
    large = [i for i in range(num_items) if scaled[i] >= 1.0]
    while small and large:
        s, l = small.pop(), large.pop()
        prob[s] = scaled[s]
        alias[s] = l
        scaled[l] -= 1.0 - scaled[s]
        (small if scaled[l] < 1.0 else large).append(l)
    # numerical leftovers keep prob 1.0 / self-alias
    return prob.astype(np.float32), alias.astype(np.int32), top2


def sample_negatives_alias(
    key: jax.Array,
    pos_items: jax.Array,
    prob: jax.Array,
    alias: jax.Array,
    fallback: jax.Array,
    avoid_collisions: bool = True,
) -> jax.Array:
    """Draw negatives ~ the alias table's distribution, inside the jitted
    step: ``slot ~ U{0..N-1}``, keep it with probability ``prob[slot]``
    else take ``alias[slot]`` — exact weighted sampling, O(1) per draw.

    Collision handling mirrors :func:`sample_negatives_weighted` (one fresh
    redraw for colliding rows), except the O(p_pos^2)-probability residue
    takes the most popular item != pos (``fallback``, from
    :func:`alias_table`) instead of a +1 shift — the shift could emit a
    zero-mass (never-interacted) item; the fallback stays in-support.
    """
    shape = pos_items.shape
    n = prob.shape[0]
    # ONE packed (N, 2) row gather per draw instead of two 1D scalar
    # gathers — 1D jnp.take lowers to the slow scalar-gather path on TPU
    # (~60x/element vs row gathers; same trick as the trainer's packed
    # epoch shuffle)
    packed = jnp.stack(
        [jax.lax.bitcast_convert_type(prob, jnp.int32), alias], axis=1
    )

    def draw(k):
        ks, kc = jax.random.split(k)
        slot = jax.random.randint(ks, shape, 0, n, dtype=jnp.int32)
        coin = jax.random.uniform(kc, shape, dtype=jnp.float32)
        rows = jnp.take(packed, slot.reshape(-1), axis=0)  # (B*, 2)
        p = jax.lax.bitcast_convert_type(rows[:, 0], jnp.float32).reshape(shape)
        a = rows[:, 1].reshape(shape)
        return jnp.where(coin < p, slot, a)

    k1, k2 = jax.random.split(key)
    neg = draw(k1)
    if avoid_collisions and n > 1:
        redraw = draw(k2)
        neg = jnp.where(neg == pos_items, redraw, neg)
        escape = jnp.where(pos_items == fallback[0], fallback[1], fallback[0])
        neg = jnp.where(neg == pos_items, escape, neg)
    return neg


def sample_negatives_weighted(
    key: jax.Array,
    pos_items: jax.Array,
    cdf: jax.Array,
    avoid_collisions: bool = True,
) -> jax.Array:
    """Draw negatives ~ the CDF's distribution, inside the jitted step.

    Inverse-CDF sampling: ``u ~ U[0,1)``, ``searchsorted(cdf, u)`` — one
    vectorized binary search over the device-resident (num_items,) CDF per
    draw. NOTE: the binary search lowers to ~log2(N) sequential gather
    rounds; the train step uses the O(1)-per-draw
    :func:`sample_negatives_alias` instead (measured 2.3x step cost at a
    100K catalog). This variant stays as the straightforward reference
    implementation the alias path is distribution-tested against.

    Collision handling: the uniform path's shift-past-the-positive trick
    would distort a non-uniform distribution, and a rejection loop is
    data-dependent control flow. Instead: one fresh redraw for colliding
    rows, then a +1 (mod N) shift for the (p_pos^2-probability) residue.
    The result is the weighted distribution excluding the positive up to
    O(p_pos^2) per row — documented approximation, no loop under ``jit``.
    """
    shape = pos_items.shape
    n = cdf.shape[0]

    def draw(k):
        u = jax.random.uniform(k, shape, dtype=jnp.float32)
        idx = jnp.searchsorted(cdf, u, side="right").astype(jnp.int32)
        # cdf[-1] can round below 1.0; clamp the u > cdf[-1] edge BEFORE
        # collision handling so the clamp can't reintroduce a collision
        return jnp.minimum(idx, n - 1)

    k1, k2 = jax.random.split(key)
    neg = draw(k1)
    if avoid_collisions and n > 1:
        redraw = draw(k2)
        neg = jnp.where(neg == pos_items, redraw, neg)
        neg = jnp.where(neg == pos_items, (neg + 1) % n, neg)
    return neg
