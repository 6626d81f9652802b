"""Learning-rate schedule (reference ``utils/scheduler.py:8-16``).

Linear warmup for 2000 steps, cosine from ``start_lr`` to ``end_lr`` at
``last_lr_decay_iter``, constant ``end_lr`` afterwards. Implemented as a
jit-traceable function of the step counter so it lives inside the compiled
train step (the reference recomputes it host-side every step).
"""

from __future__ import annotations

import jax.numpy as jnp

WARMUP_STEPS = 2000  # reference default (utils/scheduler.py:10)


def warmup_cosine_lr(
    step, start_lr: float, end_lr: float, last_decay_iter: int,
    warmup_steps: int = WARMUP_STEPS,
):
    step = jnp.asarray(step, jnp.float32)
    warm = start_lr * step / float(warmup_steps)
    ratio = 0.5 * (
        1.0
        + jnp.cos(
            (step - warmup_steps)
            / float(last_decay_iter - warmup_steps)
            * jnp.pi
        )
    )
    cos = (start_lr - end_lr) * ratio + end_lr
    return jnp.where(
        step < warmup_steps, warm, jnp.where(step <= last_decay_iter, cos, end_lr)
    )


def make_schedule(start_lr: float, end_lr: float, last_decay_iter: int,
                  warmup_steps: int = WARMUP_STEPS):
    def schedule(step):
        return warmup_cosine_lr(step, start_lr, end_lr, last_decay_iter,
                                warmup_steps)

    return schedule


def cosine_annealing_restarts(
    base_lr: float,
    t_periods,
    restarts=None,
    restart_weights=None,
    eta_min: float = 0.0,
):
    """Cosine annealing with warm restarts (reference
    ``utils/scheduler.py:24-52``, ``CosineAnnealingLR_Restart``) as a pure
    ``schedule(step) -> lr`` function for optax.

    Args:
      t_periods: list of cosine period lengths, one per restart segment.
      restarts: steps at which a new segment begins.
      restart_weights: multiplier applied to the base LR at each restart.
    """
    restarts = list(restarts or [])
    restart_weights = list(restart_weights or [1] * len(restarts))
    assert len(restarts) == len(restart_weights), \
        "restarts and their weights do not match."
    starts = [0] + restarts
    weights = [1.0] + restart_weights

    import numpy as np

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        lr = jnp.zeros_like(step)
        for i, (start, period, w) in enumerate(
            zip(starts, t_periods, weights)
        ):
            end = starts[i + 1] if i + 1 < len(starts) else np.inf
            local = jnp.clip(step - start, 0.0, float(period))
            seg_lr = eta_min + (base_lr * w - eta_min) * 0.5 * (
                1.0 + jnp.cos(jnp.pi * local / float(period))
            )
            lr = jnp.where((step >= start) & (step < end), seg_lr, lr)
        return lr

    return schedule
