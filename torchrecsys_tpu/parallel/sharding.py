"""Partition specs and state sharding.

Embedding tables are row-sharded over the ``model`` mesh axis
(``PartitionSpec('model', None)``) with their per-row optimizer accumulators
sharded identically; dense tower parameters are replicated (they are tiny —
SURVEY §2.10); batches are sharded over ``data``. GSPMD then lowers the
jitted train step: row gathers of remote shards become collective gathers
over ICI, dense grads and batch-norm statistics become psums over ``data``.
No hand-written NCCL/MPI analog exists or is needed (SURVEY §5.8).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P


def shard_map_norep(f, mesh, in_specs, out_specs):
    """shard_map with the replication (varying-manual-axes) checker off.

    Used where the checker cannot prove what construction guarantees —
    replicated outputs built from identical all-gathered scatters
    (ops/fused_pairwise.py) — and where ``pallas_call`` outputs carry no
    vma annotation at all (the fused score+top-k kernel inside
    eval/predict.py's sharded catalog scorer). The explicit in/out specs
    still pin every layout."""
    try:
        from jax import shard_map as _sm  # jax >= 0.8

        return _sm(
            f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            check_vma=False,
        )
    except ImportError:  # pragma: no cover - older jax
        from jax.experimental.shard_map import shard_map as _sm_old

        return _sm_old(
            f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            check_rep=False,
        )


def table_sharding(mesh: jax.sharding.Mesh) -> NamedSharding:
    """Row-sharded embedding table: (rows, dim) split over 'model'."""
    return NamedSharding(mesh, P("model", None))


def table_acc_sharding(mesh: jax.sharding.Mesh) -> NamedSharding:
    """Per-row accumulator: (rows,) split over 'model'."""
    return NamedSharding(mesh, P("model"))


def replicated(mesh: jax.sharding.Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: jax.sharding.Mesh) -> NamedSharding:
    """Batch arrays: leading axis split over 'data'."""
    return NamedSharding(mesh, P("data"))


def state_shardings(state: Dict[str, Any], mesh: jax.sharding.Mesh) -> Dict[str, Any]:
    """Sharding pytree matching a Trainer state pytree."""
    ts = table_sharding(mesh)
    acc = table_acc_sharding(mesh)
    rep = replicated(mesh)
    return {
        "tables": {k: ts for k in state["tables"]},
        "dense": jax.tree.map(lambda _: rep, state["dense"]),
        "model_state": jax.tree.map(lambda _: rep, state["model_state"]),
        "emb_opt": {
            k: {kk: (acc if kk == "acc" else rep) for kk in v}
            for k, v in state["emb_opt"].items()
        },
        "dense_opt": jax.tree.map(
            lambda _: rep,
            state["dense_opt"],
            is_leaf=lambda x: isinstance(x, jnp.ndarray),
        ),
        "step": rep,
        "rng": rep,
    }


def shard_state(state: Dict[str, Any], mesh: jax.sharding.Mesh) -> Dict[str, Any]:
    """Place a Trainer state on the mesh with the canonical shardings."""
    shardings = state_shardings(state, mesh)
    return jax.tree.map(lambda x, s: jax.device_put(x, s), state, shardings)
