"""Training harness: state, steps, checkpoints, Worker."""

from .state import TrainState, create_train_state, make_optimizer, \
    cosine_epoch_schedule
from .steps import (make_train_step, make_eval_step,
                    make_fused_train_step, make_fused_eval_step,
                    compute_losses)
from .checkpoints import save_checkpoint, filtered_resume, load_raw
from .preemption import PreemptionGuard
from .trainer import Worker

__all__ = ["TrainState", "create_train_state", "make_optimizer",
           "cosine_epoch_schedule", "make_train_step", "make_eval_step",
           "make_fused_train_step", "make_fused_eval_step",
           "compute_losses", "save_checkpoint", "filtered_resume",
           "load_raw", "PreemptionGuard", "Worker"]
