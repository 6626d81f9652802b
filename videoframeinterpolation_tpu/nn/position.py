"""DETR-style sine positional embedding (reference
``modules/positional_encoding.py:12-48``), NHWC output."""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

Array = jax.Array


def position_embedding_sine(
    h: int,
    w: int,
    num_pos_feats: int = 64,
    temperature: float = 10000.0,
    normalize: bool = True,
    scale: float | None = None,
    dtype=jnp.float32,
) -> Array:
    """Returns ``(1, H, W, 2 * num_pos_feats)`` with [y-feats | x-feats]
    channel order matching the reference's ``cat((pos_y, pos_x), dim=3)``."""
    if scale is None:
        scale = 2 * math.pi
    y_embed = jnp.cumsum(jnp.ones((h, w), jnp.float32), axis=0)
    x_embed = jnp.cumsum(jnp.ones((h, w), jnp.float32), axis=1)
    if normalize:
        eps = 1e-6
        y_embed = y_embed / (y_embed[-1:, :] + eps) * scale
        x_embed = x_embed / (x_embed[:, -1:] + eps) * scale

    dim_t = jnp.arange(num_pos_feats, dtype=jnp.float32)
    dim_t = temperature ** (2 * jnp.floor(dim_t / 2) / num_pos_feats)

    pos_x = x_embed[:, :, None] / dim_t
    pos_y = y_embed[:, :, None] / dim_t
    pos_x = jnp.stack(
        [jnp.sin(pos_x[:, :, 0::2]), jnp.cos(pos_x[:, :, 1::2])], axis=3
    ).reshape(h, w, -1)
    pos_y = jnp.stack(
        [jnp.sin(pos_y[:, :, 0::2]), jnp.cos(pos_y[:, :, 1::2])], axis=3
    ).reshape(h, w, -1)
    pos = jnp.concatenate([pos_y, pos_x], axis=-1)
    return pos[None].astype(dtype)
