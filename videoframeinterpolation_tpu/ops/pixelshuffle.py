"""Pixel shuffle (sub-pixel upsampling) in NHWC.

Channel ordering matches ``torch.nn.PixelShuffle``:
``out[b, h*r+i, w*r+j, c] = in[b, h, w, c*r*r + i*r + j]`` so that a weight
trained against this layout produces the same picture the reference's
``BasicResPixelShuffleGenerator`` would (``modules/generator.py:14``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def pixel_shuffle(x: Array, r: int = 2) -> Array:
    """(B, H, W, C*r*r) -> (B, H*r, W*r, C)."""
    B, H, W, Crr = x.shape
    C = Crr // (r * r)
    assert C * r * r == Crr, (x.shape, r)
    x = x.reshape(B, H, W, C, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # (B, H, r, W, r, C)
    return x.reshape(B, H * r, W * r, C)


def pixel_unshuffle(x: Array, r: int = 2) -> Array:
    """(B, H*r, W*r, C) -> (B, H, W, C*r*r); inverse of :func:`pixel_shuffle`."""
    B, Hr, Wr, C = x.shape
    H, W = Hr // r, Wr // r
    x = x.reshape(B, H, r, W, r, C)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # (B, H, W, C, r, r)
    return x.reshape(B, H, W, C * r * r)
