from .state import TrainState, create_train_state, make_optimizer
from .step import make_train_step, make_eval_step

__all__ = [
    "TrainState",
    "create_train_state",
    "make_optimizer",
    "make_train_step",
    "make_eval_step",
]
