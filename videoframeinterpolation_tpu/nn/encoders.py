"""Feature pyramid encoders.

``SameChannelResEncoder`` is the active model's shared-weight 4-level pyramid
(reference ``modules/cnn_encoders.py:6-42``): constant ``nf`` channels at
every level — a deliberately lane-friendly choice on TPU (nf=72 pads to one
128-lane register per pixel at every level).

``IFRNetEncoder`` is the growing-channel pyramid of the archived IFRNet
baseline (reference ``models/archive/IFRNet.py:54-79``).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import flax.linen as nn

from .blocks import ConvPReLU, ResBlocks

Array = jax.Array


class SameChannelResEncoder(nn.Module):
    """4-level pyramid at 1/2, 1/4, 1/8, 1/16 resolution, all ``nf`` channels."""

    nf: int
    n_res_blocks: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array) -> tuple[Array, Array, Array, Array]:
        nf = self.nf
        h = ConvPReLU(nf, stride=1, dtype=self.dtype, name="proj_in")(x)
        h = ConvPReLU(nf, stride=2, dtype=self.dtype, name="proj_down")(h)
        if self.n_res_blocks > 0:
            h = ResBlocks(nf, self.n_res_blocks, dtype=self.dtype, name="proj_res")(h)
        feat1 = h
        feat2 = self._level(feat1, "l2")
        feat3 = self._level(feat2, "l3")
        feat4 = self._level(feat3, "l4")
        return feat1, feat2, feat3, feat4

    def _level(self, x: Array, name: str) -> Array:
        x = ConvPReLU(self.nf, stride=2, dtype=self.dtype, name=f"{name}_down")(x)
        return ConvPReLU(self.nf, stride=1, dtype=self.dtype, name=f"{name}_conv")(x)


class IFRNetEncoder(nn.Module):
    """Growing-channel pyramid (32/48/72/96 by default) at 1/2..1/16."""

    channels: Sequence[int] = (32, 48, 72, 96)
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array) -> tuple[Array, ...]:
        feats = []
        h = x
        for i, c in enumerate(self.channels):
            h = ConvPReLU(c, stride=2, dtype=self.dtype, name=f"p{i+1}_down")(h)
            h = ConvPReLU(c, stride=1, dtype=self.dtype, name=f"p{i+1}_conv")(h)
            feats.append(h)
        return tuple(feats)
