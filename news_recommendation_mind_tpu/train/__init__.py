from .state import (TrainState, create_train_state, make_fused_optimizer,
                    make_optimizer, optimizer_for)
from .step import make_eval_score_fn, make_train_step
from .checkpoint import latest_step, load_checkpoint, save_checkpoint
from .loop import Trainer

__all__ = [
    "TrainState",
    "create_train_state",
    "make_fused_optimizer",
    "make_optimizer",
    "optimizer_for",
    "make_train_step",
    "make_eval_score_fn",
    "save_checkpoint",
    "load_checkpoint",
    "latest_step",
    "Trainer",
]
