"""Explicit sharded embedding lookup/update with shard_map collectives.

The reference's entire device story is ``tensor.cuda()``
(torchrecsys/helper/cuda.py:3-8); there is no sharded-table capability to
mirror (SURVEY §2.10), so this layer is designed TPU-first:

Tables are row-sharded over the ``model`` mesh axis. The jit/GSPMD training
path (train/trainer.py) lets XLA choose collectives for ``jnp.take`` on a
sharded operand; this module is the *explicit* alternative where the
communication pattern is pinned down and testable:

- ``sharded_lookup`` — "gather + psum": every device masks the replicated id
  batch to its row range, gathers locally (out-of-range ids clamped, their
  rows zeroed), and a single ``psum`` over ``model`` reconstructs full rows.
  One collective of B x D per lookup, rides ICI. For the common recsys case
  (B x D << table shard) this matches the all-to-all row exchange's traffic
  within 2x while being a single fused collective.
- ``sharded_scatter_add`` — the transpose: every device masks the update
  rows to its range and scatter-adds locally; no collective at all, because
  the row-parallel layout makes gradient scatter embarrassingly parallel
  over ``model`` (the ``data``-axis reduction of per-replica gradients is
  the caller's psum, inserted by GSPMD in the jitted step).

Both are numerically identical to their dense single-device counterparts
(tests/test_sharding.py::TestExplicitLookup).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _lookup_block(table_shard: jnp.ndarray, ids: jnp.ndarray, axis: str) -> jnp.ndarray:
    """Per-device body: local masked gather + psum over the table axis."""
    shard_rows = table_shard.shape[0]
    start = jax.lax.axis_index(axis) * shard_rows
    local = ids - start
    in_shard = (local >= 0) & (local < shard_rows)
    local = jnp.clip(local, 0, shard_rows - 1)
    rows = jnp.take(table_shard, local, axis=0)
    rows = jnp.where(in_shard[..., None], rows, 0)
    return jax.lax.psum(rows, axis)


def sharded_lookup(table: jnp.ndarray, ids: jnp.ndarray, mesh: Mesh, axis: str = "model") -> jnp.ndarray:
    """Gather rows of a row-sharded table; result replicated over ``axis``.

    table: (R, D) sharded P(axis, None); R must divide evenly (tables are
    padded to ROW_ALIGN, models/base.py). ids: any shape, replicated over
    ``axis`` (may be sharded over other axes, e.g. 'data').
    """
    fn = jax.shard_map(
        functools.partial(_lookup_block, axis=axis),
        mesh=mesh,
        in_specs=(P(axis, None), P()),
        out_specs=P(),
    )
    return fn(table, ids)


def _scatter_block(
    table_shard: jnp.ndarray,
    ids: jnp.ndarray,
    updates: jnp.ndarray,
    axis: str,
) -> jnp.ndarray:
    shard_rows = table_shard.shape[0]
    start = jax.lax.axis_index(axis) * shard_rows
    local = ids - start
    in_shard = (local >= 0) & (local < shard_rows)
    local = jnp.clip(local, 0, shard_rows - 1)
    upd = jnp.where(in_shard[..., None], updates, 0).astype(table_shard.dtype)
    return table_shard.at[local].add(upd)


def sharded_scatter_add(
    table: jnp.ndarray,
    ids: jnp.ndarray,
    updates: jnp.ndarray,
    mesh: Mesh,
    axis: str = "model",
) -> jnp.ndarray:
    """Scatter-add ``updates`` (replicated over ``axis``) into a row-sharded
    table. Communication-free: each device applies only its rows."""
    fn = jax.shard_map(
        functools.partial(_scatter_block, axis=axis),
        mesh=mesh,
        in_specs=(P(axis, None), P(), P()),
        out_specs=P(axis, None),
    )
    return fn(table, ids, updates)
