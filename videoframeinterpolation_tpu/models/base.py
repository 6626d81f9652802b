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


def multi_t_apply(model, params, x0: Array, x1: Array,
                  ts: tuple) -> Array:
    """All intermediate frames of one pair in a single traced program.

    For models exposing the staged ``encode``/``decode`` API (the flagship
    ``DATwConstantnC``): the t-invariant encoder pyramid runs ONCE, then
    ``decode`` runs per instant — factor-N sequence upsampling pays one
    encoder and one device dispatch per pair instead of one of each per
    output frame. No reference counterpart (its eval scripts are
    t=0.5-only); this is a TPU-first serving capability.

    Args:
      model: a flax module with ``encode``/``decode`` methods.
      params: model variables.
      x0, x1: ``(B, H, W, 3)``.
      ts: static tuple of python floats in (0, 1).

    Returns:
      ``(len(ts), B, H, W, 3)`` predictions.
    """
    feats, mean = model.apply(params, x0, x1, method="encode")
    B = x0.shape[0]
    preds = [
        model.apply(params, feats, mean,
                    jnp.full((B, 1, 1, 1), t, jnp.float32), method="decode")
        for t in ts
    ]
    return jnp.stack(preds)
