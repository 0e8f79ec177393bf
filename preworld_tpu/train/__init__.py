from .train_state import (
    TrainState,
    create_train_state,
    make_train_step,
    eval_params,
    make_optimizer,
    ema_decay_schedule,
)

__all__ = [
    "TrainState",
    "create_train_state",
    "make_train_step",
    "eval_params",
    "make_optimizer",
    "ema_decay_schedule",
]
