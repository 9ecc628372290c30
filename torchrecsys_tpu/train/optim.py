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
) -> Tuple[Dict[str, jnp.ndarray], Dict[str, Any]]:
    """Scatter per-row gradients into each table.

    ``grads[name]`` is a list of (ids, row_grads) pairs — one per gather site
    (e.g. the positive-item and negative-item scores both touch the ``item``
    table). ids may be multi-dimensional (metadata gathers are (B, W));
    row_grads carries one trailing dim of the table's embedding width.
    """
    new_tables = dict(tables)
    new_state = {k: dict(v) for k, v in opt_state.items()}
    for name, sites in grads.items():
        if not sites:
            continue
        table = new_tables[name]
        d = table.shape[-1]
        ids = jnp.concatenate([jnp.reshape(i, (-1,)) for i, _ in sites])
        g = jnp.concatenate(
            [jnp.reshape(gr, (-1, d)).astype(jnp.float32) for _, gr in sites]
        )
        if kind == "rowwise_adagrad":
            acc = new_state[name]["acc"]
            acc = acc.at[ids].add(jnp.mean(g * g, axis=-1))
            scale = jax.lax.rsqrt(acc[ids] + eps)
            delta = (-lr * g * scale[:, None]).astype(table.dtype)
            new_state[name]["acc"] = acc
        elif kind == "sgd":
            delta = (-lr * g).astype(table.dtype)
        else:
            raise ValueError(f"unknown embedding optimizer {kind!r}")
        new_tables[name] = table.at[ids].add(delta)
    return new_tables, new_state


def make_dense_optimizer(kind: str, lr: float) -> optax.GradientTransformation:
    if kind == "adam":
        return optax.adam(lr)
    if kind == "adamw":
        return optax.adamw(lr)
    if kind == "adagrad":
        return optax.adagrad(lr)
    if kind == "sgd":
        return optax.sgd(lr)
    raise ValueError(f"unknown dense optimizer {kind!r}")
