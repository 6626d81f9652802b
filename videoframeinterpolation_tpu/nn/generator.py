"""Pixel generators (reference ``modules/generator.py``)."""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops import pixel_shuffle
from .blocks import PReLU, ResBlocks, conv

Array = jax.Array


class BasicResPixelShuffleGenerator(nn.Module):
    """N res blocks -> conv to 4*nf -> PixelShuffle(2) -> HR conv -> RGB;
    output is ``clamp(rgb + mean, 0, 1)`` (``modules/generator.py:7-24``)."""

    nf: int
    n_res_blocks: int
    dtype: Any = None

    @nn.compact
    def __call__(self, feat: Array, mean: Array) -> Array:
        nf = self.nf
        h = ResBlocks(nf, self.n_res_blocks, dtype=self.dtype,
                      name="reconstruction")(feat)
        h = conv(nf * 4, dtype=self.dtype, name="upconv1")(h)
        h = pixel_shuffle(h, 2)
        h = PReLU(nf, name="prelu1")(h)
        h = conv(nf, dtype=self.dtype, name="hrconv")(h)
        h = PReLU(nf, name="prelu2")(h)
        h = conv(3, dtype=self.dtype, name="conv_last")(h)
        return jnp.clip(h + mean.astype(h.dtype), 0.0, 1.0)
