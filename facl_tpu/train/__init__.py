from facl_tpu.train.optim import make_optimizer, step_decay_schedule
from facl_tpu.train.state import TrainState, create_train_state
from facl_tpu.train.trainer import Trainer, make_eval_step, make_train_step
from facl_tpu.train.checkpoint import (
    latest_checkpoint,
    restore_checkpoint,
    restore_latest,
    save_checkpoint,
)

__all__ = [
    "make_optimizer",
    "step_decay_schedule",
    "TrainState",
    "create_train_state",
    "Trainer",
    "make_eval_step",
    "make_train_step",
    "latest_checkpoint",
    "restore_checkpoint",
    "restore_latest",
    "save_checkpoint",
]
