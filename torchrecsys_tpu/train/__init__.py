from torchrecsys_tpu.train.losses import (
    LOSS_REGISTRY,
    adaptive_hinge_loss,
    bpr_loss,
    get_loss,
    get_per_row_loss,
    hinge_loss,
    logistic_loss,
)
from torchrecsys_tpu.train.streaming import SuperBatchStream, fit_streaming
from torchrecsys_tpu.train.trainer import Trainer, TrainState

__all__ = [
    "LOSS_REGISTRY",
    "hinge_loss",
    "bpr_loss",
    "logistic_loss",
    "adaptive_hinge_loss",
    "get_loss",
    "get_per_row_loss",
    "Trainer",
    "TrainState",
    "SuperBatchStream",
    "fit_streaming",
]
