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

import dataclasses
import json
import os
import pickle
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from torchrecsys_tpu.config import DataSchema, ModelConfig, TrainConfig


def save_checkpoint(
    directory: str,
    state: Dict[str, Any],
    schema: Optional[DataSchema] = None,
    aux: Optional[Dict[str, Any]] = None,
) -> None:
    """Save the train state (Orbax, sharding-aware) plus optional sidecar
    artifacts: the dataset schema and an ``aux`` dict (id-encoder vocabs,
    metadata table, model/train configs — see :func:`save_aux`). Without the
    sidecars a restore needs the original dataset to rebuild raw-id mappings;
    with them a cold process restores and predicts on raw ids directly."""
    directory = os.path.abspath(directory)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.join(directory, "state"), state, force=True)
    ckptr.wait_until_finished()
    if schema is not None:
        with open(os.path.join(directory, "schema.json"), "w") as f:
            f.write(schema.to_json())
    if aux is not None:
        save_aux(directory, aux)


def save_aux(directory: str, aux: Dict[str, Any]) -> None:
    with open(os.path.join(os.path.abspath(directory), "aux.pkl"), "wb") as f:
        pickle.dump(aux, f, protocol=pickle.HIGHEST_PROTOCOL)


def load_aux(directory: str) -> Optional[Dict[str, Any]]:
    path = os.path.join(os.path.abspath(directory), "aux.pkl")
    if not os.path.exists(path):
        return None
    with open(path, "rb") as f:
        return pickle.load(f)


def pack_store_aux(store, model_cfg: ModelConfig, train_cfg: Optional[TrainConfig]) -> Dict[str, Any]:
    """Everything beyond the numeric state that a cold restore needs:
    raw-id vocabularies, the item metadata table, the configs — and, for
    sequence models, the per-user history tables (they derive from the
    train split, which a cold process does not have)."""
    m = store.metadata
    aux: Dict[str, Any] = {
        "user_vocab": store.user_encoder.to_list(),
        "item_vocab": store.item_encoder.to_list(),
        "metadata": {
            "ids": np.asarray(m.ids),
            "mask": np.asarray(m.mask),
            "names": tuple(m.names),
            "vocabs": [e.to_list() for e in m.encoders],
        },
        "model_cfg": dataclasses.asdict(model_cfg),
        "train_cfg": dataclasses.asdict(train_cfg) if train_cfg else None,
    }
    from torchrecsys_tpu.models import MODEL_REGISTRY

    cls = MODEL_REGISTRY.get(model_cfg.net_type)
    if getattr(cls, "needs_history", False):
        h_ids, h_mask = store.user_history(model_cfg.history_len)
        aux["history"] = {"ids": np.asarray(h_ids), "mask": np.asarray(h_mask)}
    return aux


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
