"""Training loop, state, schedule, and checkpointing."""

from .preemption import PreemptionGuard
from .schedule import make_schedule, warmup_cosine_lr
from .state import TrainState, create_optimizer, create_train_state
from .step import (
    make_chunked_train_step,
    make_distill_loss_fn,
    make_distill_pool_chunked_step,
    make_distill_train_step,
    make_inference_fn,
    make_loss_fn,
    make_pool_chunked_train_step,
    make_train_step,
)

__all__ = [
    "PreemptionGuard",
    "make_schedule",
    "warmup_cosine_lr",
    "TrainState",
    "create_optimizer",
    "create_train_state",
    "make_chunked_train_step",
    "make_distill_loss_fn",
    "make_distill_pool_chunked_step",
    "make_distill_train_step",
    "make_pool_chunked_train_step",
    "make_inference_fn",
    "make_loss_fn",
    "make_train_step",
]
