"""Model zoo factory.

Reference analog: ``TorchRecSys._init_net`` (torchrecsys/model.py:125-168).
Unlike the reference — where ``'neucf'``/``'lstm'`` branches construct nothing
and crash with ``AttributeError`` (model.py:162-168, SURVEY §2.9 #6) — every
advertised ``net_type`` here either works or raises a clear error.
"""

from __future__ import annotations

from torchrecsys_tpu.config import DataSchema, ModelConfig
from torchrecsys_tpu.models.base import Batch, Params, RecModel, State, TableSpec
from torchrecsys_tpu.models.ease import EASE
from torchrecsys_tpu.models.fm import FMModel
from torchrecsys_tpu.models.linear import LinearModel
from torchrecsys_tpu.models.lstm import LSTMModel
from torchrecsys_tpu.models.mlp import MLPModel
from torchrecsys_tpu.models.neucf import NeuCFModel
from torchrecsys_tpu.models.sasrec import SASRecModel

MODEL_REGISTRY = {
    "linear": LinearModel,
    "mlp": MLPModel,
    "fm": FMModel,
    "neucf": NeuCFModel,
    "lstm": LSTMModel,
    "sasrec": SASRecModel,
}


def build_model(schema: DataSchema, cfg: ModelConfig) -> RecModel:
    try:
        cls = MODEL_REGISTRY[cfg.net_type]
    except KeyError:
        raise ValueError(
            f"unknown net_type {cfg.net_type!r}; available: "
            f"{sorted(MODEL_REGISTRY)} (plus 'ease' via torchrecsys_tpu.models.EASE)"
        ) from None
    return cls(schema, cfg)


__all__ = [
    "MODEL_REGISTRY",
    "build_model",
    "RecModel",
    "TableSpec",
    "Batch",
    "Params",
    "State",
    "LinearModel",
    "MLPModel",
    "FMModel",
    "NeuCFModel",
    "LSTMModel",
    "SASRecModel",
    "EASE",
]
