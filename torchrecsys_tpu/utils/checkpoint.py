"""Sharded checkpointing via Orbax.

The reference has **no** checkpointing at all — no ``torch.save``/``load``
anywhere; its only persistence is an optional (and commented-out) dump of
dataset stats (torchrecsys/dataset/dataset.py:307-316, torchrecsys/model.py:98;
SURVEY §5.4). This module is a new capability: full train-state save/restore
(tables, dense params, optimizer accumulators, BN stats, step, rng) that is
sharding-aware — each host writes only its shards, and restore re-shards onto
whatever mesh the restoring process uses.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from torchrecsys_tpu.config import DataSchema


def save_checkpoint(directory: str, state: Dict[str, Any], schema: Optional[DataSchema] = None) -> None:
    directory = os.path.abspath(directory)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.join(directory, "state"), state, force=True)
    ckptr.wait_until_finished()
    if schema is not None:
        with open(os.path.join(directory, "schema.json"), "w") as f:
            f.write(schema.to_json())


def restore_checkpoint(directory: str, target_state: Dict[str, Any]) -> Dict[str, Any]:
    """Restore into the structure (and shardings) of ``target_state``."""
    directory = os.path.abspath(directory)
    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(
        os.path.join(directory, "state"),
        jax.tree.map(ocp.utils.to_shape_dtype_struct, target_state),
    )
    return restored


def load_schema(directory: str) -> DataSchema:
    with open(os.path.join(os.path.abspath(directory), "schema.json")) as f:
        return DataSchema.from_dict(json.load(f))
