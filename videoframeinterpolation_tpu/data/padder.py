"""InputPadder: replicate-pad to a stride multiple for arbitrary-size
inference (reference ``data/__init__.py:6-20``); used by SNU-FILM eval."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


class InputPadder:
    """Pads NHWC images so H and W are divisible by ``divisor``."""

    def __init__(self, shape, divisor: int = 16):
        self.ht, self.wd = shape[-3], shape[-2]  # NHWC
        pad_ht = (((self.ht // divisor) + 1) * divisor - self.ht) % divisor
        pad_wd = (((self.wd // divisor) + 1) * divisor - self.wd) % divisor
        # (left, right, top, bottom) like the reference's F.pad order.
        self._pad = [pad_wd // 2, pad_wd - pad_wd // 2,
                     pad_ht // 2, pad_ht - pad_ht // 2]

    def pad(self, *inputs):
        l, r, t, b = self._pad
        return [
            jnp.pad(x, ((0, 0), (t, b), (l, r), (0, 0)), mode="edge")
            for x in inputs
        ]

    def unpad(self, x):
        ht, wd = x.shape[-3], x.shape[-2]
        l, r, t, b = self._pad
        return x[..., t:ht - b, l:wd - r, :]
