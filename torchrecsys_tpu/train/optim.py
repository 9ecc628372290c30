"""Optimizers: sparse row-wise updates for embedding tables + optax for dense.

The reference relies on ``torch.nn.Embedding(sparse=True)`` plus
``torch.optim.SparseAdam``/``SGD`` — and its README quickstart optimizer
combination does not actually run (SURVEY §2.9 #2). XLA has no sparse
gradients, so the TPU-native equivalent differentiates the loss with respect
to the **gathered rows** only and scatter-adds the per-row updates back into
the table (SURVEY §7 hard part (a)). No table-sized gradient buffer is ever
materialized; with donated buffers the scatters update the table in place.

Embedding optimizers:

- ``rowwise_adagrad`` — the standard production choice for recsys embedding
  tables (one scalar accumulator per row, DLRM-style): per step
  ``acc[r] += mean(g_r^2)``, ``row[r] -= lr * g_r / sqrt(acc[r] + eps)``.
  Duplicate ids inside a batch are handled by scatter-add; every duplicate's
  update is scaled by the same post-accumulation learning rate, so the row
  delta equals ``-lr * (sum of dup grads) / sqrt(acc_after)`` — the same
  total as a dense-gradient implementation.
- ``sgd`` — exactly equivalent to dense SGD on the embedding tables.

Dense parameters use optax (``adam`` / ``adagrad`` / ``sgd`` / ``adamw``).
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import optax

RowGrads = List[Tuple[jnp.ndarray, jnp.ndarray]]  # [(ids(any shape), g(ids+[d]))]


def init_embedding_opt(
    kind: str, tables: Dict[str, jnp.ndarray]
) -> Dict[str, Any]:
    if kind == "rowwise_adagrad":
        return {
            name: {"acc": jnp.zeros((t.shape[0],), jnp.float32)}
            for name, t in tables.items()
        }
    if kind == "sgd":
        return {name: {} for name in tables}
    raise ValueError(f"unknown embedding optimizer {kind!r}")


def apply_embedding_updates(
    kind: str,
    lr: float,
    tables: Dict[str, jnp.ndarray],
    opt_state: Dict[str, Any],
    grads: Dict[str, RowGrads],
    eps: float = 1e-10,
    sorted_tables: frozenset = frozenset(),
) -> Tuple[Dict[str, jnp.ndarray], Dict[str, Any]]:
    """Scatter per-row gradients into each table.

    ``grads[name]`` is a list of (ids, row_grads) pairs — one per gather site
    (e.g. the positive-item and negative-item scores both touch the ``item``
    table). ids may be multi-dimensional (metadata gathers are (B, W));
    row_grads carries one trailing dim of the table's embedding width.

    ``sorted_tables`` names tables whose (single-site) ids arrive sorted —
    the epoch builder's in-batch sort by user id (TrainConfig.
    sort_batch_by_user) — letting the scatter use XLA's fast merge lowering.
    """
    new_tables = dict(tables)
    new_state = {k: dict(v) for k, v in opt_state.items()}
    for name, sites in grads.items():
        if not sites:
            continue
        table = new_tables[name]
        d = table.shape[-1]
        srt = name in sorted_tables and len(sites) == 1
        ids = jnp.concatenate([jnp.reshape(i, (-1,)) for i, _ in sites])
        g = jnp.concatenate(
            [jnp.reshape(gr, (-1, d)).astype(jnp.float32) for _, gr in sites]
        )
        if kind == "rowwise_adagrad":
            acc = new_state[name]["acc"]
            acc = acc.at[ids].add(jnp.mean(g * g, axis=-1), indices_are_sorted=srt)
            scale = jax.lax.rsqrt(acc[ids] + eps)
            delta = (-lr * g * scale[:, None]).astype(table.dtype)
            new_state[name]["acc"] = acc
        elif kind == "sgd":
            delta = (-lr * g).astype(table.dtype)
        else:
            raise ValueError(f"unknown embedding optimizer {kind!r}")
        new_tables[name] = table.at[ids].add(delta, indices_are_sorted=srt)
    return new_tables, new_state


# ---------------------------------------------------------------------------
# Fused "augmented table" layout (TrainConfig.fused_embedding_update).
#
# Motivation (measured on TPU v5e, B=32768 MLP step): the rowwise-adagrad
# accumulator ops above — a 1D scatter-add into acc (R,), then a 1D gather of
# acc[ids] — cost ~0.9 ms per table per step, ~60x more per element than the
# 2D row scatter, because XLA lowers 1D scalar scatter/gather element-at-a-
# time. Meanwhile an (R, D) f32 table with D <= 128 is physically tiled
# T(8,128): columns D..127 are already-allocated HBM bandwidth. So for the
# duration of one jitted epoch the accumulator is stored as column D of each
# table; it then rides the existing row gather (forward) and the single row
# scatter-add (update) for free, eliminating all standalone accumulator ops.
#
# Semantics: the accumulator CONTENTS stay exact (acc' = acc + sum of all
# within-batch msq, identical to apply_embedding_updates). The only
# divergence is the scale applied to rows duplicated *within one batch*:
# each occurrence scales by rsqrt(acc_old + own msq) instead of
# rsqrt(acc_after_all_duplicates) — a slightly larger step for within-batch
# duplicates, equal whenever a row appears once per batch. The reference has
# no embedding optimizer of its own to match (it defers to torch.optim,
# SURVEY §2.9 #2), so this is this framework's defined semantics; tests
# cover the no-duplicate equality and the accumulator exactness.
# ---------------------------------------------------------------------------

FusedRowGrads = List[Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]]
# [(ids(any shape), g(ids+[d]), acc_old(ids))]


def supports_fused_layout(kind: str, tables: Dict[str, jnp.ndarray]) -> bool:
    """Fused layout needs f32 tables (the accumulator shares their dtype)."""
    return kind == "rowwise_adagrad" and all(
        t.dtype == jnp.float32 for t in tables.values()
    )


def augment_tables(
    tables: Dict[str, jnp.ndarray], opt_state: Dict[str, Any]
) -> Dict[str, jnp.ndarray]:
    """(R, D) tables + (R,) accumulators -> (R, D+1) augmented tables."""
    return {
        name: jnp.concatenate([t, opt_state[name]["acc"][:, None]], axis=1)
        for name, t in tables.items()
    }


def split_augmented(
    aug: Dict[str, jnp.ndarray]
) -> Tuple[Dict[str, jnp.ndarray], Dict[str, Any]]:
    """Inverse of :func:`augment_tables`."""
    tables = {name: a[:, :-1] for name, a in aug.items()}
    opt_state = {name: {"acc": a[:, -1]} for name, a in aug.items()}
    return tables, opt_state


def apply_embedding_updates_fused(
    lr: float,
    aug_tables: Dict[str, jnp.ndarray],
    grads: Dict[str, FusedRowGrads],
    eps: float = 1e-10,
    sorted_tables: frozenset = frozenset(),
) -> Dict[str, jnp.ndarray]:
    """Rowwise-adagrad step on augmented tables: ONE row scatter per table
    carries both the parameter delta (cols 0..D-1) and the accumulator
    increment (col D). ``sorted_tables`` as in :func:`apply_embedding_updates`."""
    new_tables = dict(aug_tables)
    for name, sites in grads.items():
        if not sites:
            continue
        aug = new_tables[name]
        d = aug.shape[-1] - 1
        srt = name in sorted_tables and len(sites) == 1
        ids = jnp.concatenate([jnp.reshape(i, (-1,)) for i, _, _ in sites])
        g = jnp.concatenate(
            [jnp.reshape(gr, (-1, d)).astype(jnp.float32) for _, gr, _ in sites]
        )
        acc_old = jnp.concatenate(
            [jnp.reshape(a, (-1,)).astype(jnp.float32) for _, _, a in sites]
        )
        msq = jnp.mean(g * g, axis=-1)
        scale = jax.lax.rsqrt(acc_old + msq + eps)
        upd = jnp.concatenate([-lr * g * scale[:, None], msq[:, None]], axis=1)
        new_tables[name] = aug.at[ids].add(
            upd.astype(aug.dtype), indices_are_sorted=srt
        )
    return new_tables


def make_dense_optimizer(
    kind: str, lr, schedule=None
) -> optax.GradientTransformation:
    """``lr`` may be a float or an optax schedule; ``schedule`` (from
    :func:`make_lr_schedule`) takes precedence when given."""
    lr = schedule if schedule is not None else lr
    if kind == "adam":
        return optax.adam(lr)
    if kind == "adamw":
        return optax.adamw(lr)
    if kind == "adagrad":
        return optax.adagrad(lr)
    if kind == "sgd":
        return optax.sgd(lr)
    raise ValueError(f"unknown dense optimizer {kind!r}")


def make_lr_schedule(base_lr: float, spec):
    """Build a ``step -> lr`` schedule from ``TrainConfig.lr_schedule``.

    The reference has no learning-rate schedules (the lr lives inside the
    user's torch optimizer object, model.py:203); this is a new capability.
    ``spec`` forms:

    - ``None`` — constant lr (returns None; callers use ``base_lr``).
    - a callable ``step -> lr`` (e.g. any optax schedule) — used as-is.
      Note: callables don't serialize into checkpoints; prefer dict specs.
    - a dict, JSON/checkpoint-serializable:
        {"kind": "cosine", "decay_steps": N[, "alpha": a]}
        {"kind": "step", "boundaries_and_scales": {step: scale, ...}}
        {"kind": "exponential", "transition_steps": N, "decay_rate": r
            [, "staircase": bool]}
        {"kind": "linear", "transition_steps": N[, "end_value": v]}

    Every schedule starts from ``base_lr`` (TrainConfig.learning_rate) and is
    evaluated at the *global step counter* (state["step"]), so it is
    continuous across epochs and across fit() calls.
    """
    if spec is None:
        return None
    if callable(spec):
        return spec
    kind = spec.get("kind")
    if kind == "cosine":
        return optax.cosine_decay_schedule(
            base_lr, int(spec["decay_steps"]), float(spec.get("alpha", 0.0))
        )
    if kind == "step":
        return optax.piecewise_constant_schedule(
            base_lr,
            {int(k): float(v) for k, v in spec["boundaries_and_scales"].items()},
        )
    if kind == "exponential":
        return optax.exponential_decay(
            base_lr,
            int(spec["transition_steps"]),
            float(spec["decay_rate"]),
            staircase=bool(spec.get("staircase", False)),
        )
    if kind == "linear":
        return optax.linear_schedule(
            base_lr, float(spec.get("end_value", 0.0)), int(spec["transition_steps"])
        )
    raise ValueError(f"unknown lr_schedule spec {spec!r}")
