from samble_tpu.train.losses import (
    cross_entropy,
    stn_regularization_loss,
    token_orthogonality_loss,
)
from samble_tpu.train.schedules import make_lr_schedule, make_optimizer
from samble_tpu.train.state import TrainState, create_train_state
from samble_tpu.train import metrics

__all__ = [
    "cross_entropy",
    "stn_regularization_loss",
    "token_orthogonality_loss",
    "make_lr_schedule",
    "make_optimizer",
    "TrainState",
    "create_train_state",
    "metrics",
]
