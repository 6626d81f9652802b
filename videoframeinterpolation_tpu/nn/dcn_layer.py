"""Flow-seeded modulated deformable conv layer (reference ``modules/dcnv2.py``).

Predicts a 2-channel "offset flow" from movement features, backward-warps the
input by it, predicts zero-initialized tanh-bounded residual offsets plus a
sigmoid modulation mask, seeds every kernel tap's offset with the flow, and
runs the grouped deformable convolution (``ops.dcn.deform_conv2d``).

The offset tensor here uses the clean ``(B, H, W, G, K*K, (dx, dy))`` layout;
the reference's channel-packing quirk (``modules/dcnv2.py:54-57``) is
documented and intentionally not reproduced (models train from scratch).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops import bwarp, deform_conv2d
from .blocks import ConvPReLU, conv, zero_init

Array = jax.Array


class DeformableConv2d(nn.Module):
    """DCNv2 with flow-seeded offsets; returns ``(features, offset_flow)``."""

    features: int
    kernel_size: int = 3
    padding: int = 1
    groups: int = 8
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array, movement_feat: Array) -> tuple[Array, Array]:
        B, H, W, Cin = x.shape
        G, K = self.groups, self.kernel_size
        KK = K * K
        Cg = Cin // G
        CoutG = self.features // G

        # "Hopefully close to optical flow" single-conv predictor
        # (modules/dcnv2.py:24).
        offset_flow = conv(2, dtype=self.dtype, name="offset_flow_conv")(
            movement_feat
        )

        feat_t_from_x = bwarp(x, offset_flow)

        h = jnp.concatenate([feat_t_from_x, movement_feat, offset_flow], axis=-1)
        h = ConvPReLU(Cin, dtype=self.dtype, name="om1")(h)
        h = ConvPReLU(Cin, dtype=self.dtype, name="om2")(h)
        om = conv(
            G * 3 * KK, kernel_init=zero_init, bias_init=zero_init,
            dtype=self.dtype, name="om_out",
        )(h)

        om = om.reshape(B, H, W, G, 3, KK)
        res_x, res_y, mask = om[..., 0, :], om[..., 1, :], om[..., 2, :]
        res_offset = 2.0 * jnp.tanh(jnp.stack([res_x, res_y], axis=-1))
        # Seed every tap of every group with the predicted flow
        # (modules/dcnv2.py:57: offsets initialize at the flow).
        offset = res_offset + offset_flow[:, :, :, None, None, :]
        mask = jax.nn.sigmoid(mask)

        # torch-default conv init with the *per-group* fan-in (KK * Cg);
        # generic variance_scaling would wrongly fold G into the fan.
        def _w_init(key, shape, dtype=jnp.float32):
            bound = (1.0 / (Cg * KK)) ** 0.5
            return jax.random.uniform(key, shape, dtype, -bound, bound)

        weight = self.param("weight", _w_init, (G, KK, Cg, CoutG), jnp.float32)
        bias = self.param("bias", zero_init, (self.features,), jnp.float32)

        out = deform_conv2d(
            x, offset, mask, weight, bias,
            kernel_size=K, padding=self.padding,
        )
        return out, offset_flow
