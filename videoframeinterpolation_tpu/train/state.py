"""Train state + optimizer (reference ``Trainer.py:24``: AdamW, torch defaults).

The reference saves the optimizer state under key ``'optimizer'`` but loads
``'optim'`` — silently never restoring it (``Trainer.py:28-29`` vs ``:52``,
a bug recorded in SURVEY.md section 5.4). Here the whole TrainState
(params + opt_state + step) is one pytree checkpointed atomically by Orbax,
so resume is exact by construction.
"""

from __future__ import annotations

from typing import Any

import jax
import optax
from flax.training import train_state

from ..config import Config
from .schedule import make_schedule


class TrainState(train_state.TrainState):
    """flax TrainState; step counts optimizer updates like the reference's."""


def create_optimizer(cfg: Config) -> optax.GradientTransformation:
    """AdamW with the warmup-cosine schedule.

    torch AdamW defaults (betas 0.9/0.999, eps 1e-8) and weight decay applied
    to *all* parameters scaled by the live LR — matching
    ``optim.AdamW(model.parameters(), lr=start_lr, weight_decay=wd)``.
    """
    schedule = make_schedule(cfg.start_lr, cfg.end_lr, cfg.last_lr_decay_iter,
                             cfg.warmup_steps)
    tx = optax.adamw(
        learning_rate=schedule,
        b1=0.9,
        b2=0.999,
        eps=1e-8,
        weight_decay=cfg.weight_decay,
    )
    if cfg.grad_clip is not None:
        # Honored here even though the reference's Trainer never applies
        # its configs' grad_clip (dead DotMap key, e.g.
        # configs/archive/IFRNet.yaml "grad_clip: 1.0").
        tx = optax.chain(optax.clip_by_global_norm(cfg.grad_clip), tx)
    return tx


def create_train_state(model, params, cfg: Config) -> TrainState:
    return TrainState.create(
        apply_fn=model.apply, params=params, tx=create_optimizer(cfg)
    )
