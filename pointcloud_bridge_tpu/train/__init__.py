"""Training engine (L3)."""

from .loop import TrainState, create_train_state, make_train_step, make_eval_step, train

__all__ = [
    "TrainState",
    "create_train_state",
    "make_train_step",
    "make_eval_step",
    "train",
]
