"""Shared model utilities (reference ``models/BaseModel.py``)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import scale_resize

Array = jax.Array


def norm_w_rgb_mean(x0: Array, x1: Array) -> tuple[Array, Array, Array]:
    """Subtract the joint per-sample scalar mean of both frames.

    Matches ``BaseModel.norm_w_rgb_mean`` (``models/BaseModel.py:13-17``):
    one scalar per batch item, averaged over both frames' channels and
    pixels.

    Returns ``(x0 - m, x1 - m, m)`` with ``m`` shaped ``(B, 1, 1, 1)``.
    """
    m0 = jnp.mean(x0, axis=(1, 2, 3), keepdims=True)
    m1 = jnp.mean(x1, axis=(1, 2, 3), keepdims=True)
    mean = 0.5 * (m0 + m1)
    return x0 - mean, x1 - mean, mean


resize = scale_resize  # BaseModel.resize: bilinear, align_corners=True
