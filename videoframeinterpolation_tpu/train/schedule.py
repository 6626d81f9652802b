"""Learning-rate schedule (reference ``utils/scheduler.py:8-16``).

Linear warmup for 2000 steps, cosine from ``start_lr`` to ``end_lr`` at
``last_lr_decay_iter``, constant ``end_lr`` afterwards. Implemented as a
jit-traceable function of the step counter so it lives inside the compiled
train step (the reference recomputes it host-side every step).
"""

from __future__ import annotations

import jax.numpy as jnp

WARMUP_STEPS = 2000


def warmup_cosine_lr(
    step, start_lr: float, end_lr: float, last_decay_iter: int
):
    step = jnp.asarray(step, jnp.float32)
    warm = start_lr * step / float(WARMUP_STEPS)
    ratio = 0.5 * (
        1.0
        + jnp.cos(
            (step - WARMUP_STEPS)
            / float(last_decay_iter - WARMUP_STEPS)
            * jnp.pi
        )
    )
    cos = (start_lr - end_lr) * ratio + end_lr
    return jnp.where(
        step < WARMUP_STEPS, warm, jnp.where(step <= last_decay_iter, cos, end_lr)
    )


def make_schedule(start_lr: float, end_lr: float, last_decay_iter: int):
    def schedule(step):
        return warmup_cosine_lr(step, start_lr, end_lr, last_decay_iter)

    return schedule
