from kosmosx_tpu.train.loss import next_token_loss
from kosmosx_tpu.train.optim import (
    make_optimizer,
    make_schedule,
    stable_adamw,
)
from kosmosx_tpu.train.trainer import TrainConfig, Trainer, TrainState, make_train_step

__all__ = [
    "next_token_loss",
    "make_optimizer", "make_schedule", "stable_adamw",
    "TrainConfig", "Trainer", "TrainState", "make_train_step",
]
