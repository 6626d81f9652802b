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

from ..ops import bwarp, deform_conv2d, fwarp
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


class DeformableConv2dWithFwarp(nn.Module):
    """Forward-warp-seeded DCN (``DeformableConv2dwithFwarpv2``).

    The reference imports this symbol (``models/archive/DCNTrans.py:8``) but
    the definition was deleted from ``modules/dcnv2.py`` — a broken archive
    import (SURVEY.md section 2.5). Reconstructed from its call site
    (``DCNTrans.py:207-213``): predicts a *full* source->target flow, builds
    the query feature by average-mode forward-splatting the input along
    ``t * flow``, predicts residual offsets/mask from the splatted feature,
    and runs the deformable conv with taps seeded at ``-t * flow``
    (backward-sampling the source at the splat origin).

    Returns ``(features, flow)`` where ``flow`` is the full f_st (the caller
    distills it against the full pseudo-GT flow, ``DCNTrans.py:338``).
    """

    features: int
    kernel_size: int = 3
    padding: int = 1
    groups: int = 8
    dtype: Any = None

    @nn.compact
    def __call__(
        self, x: Array, t: Array, movement_feat: Array
    ) -> tuple[Array, Array]:
        B, H, W, Cin = x.shape
        G, K = self.groups, self.kernel_size
        KK = K * K
        Cg = Cin // G
        CoutG = self.features // G

        flow = conv(2, dtype=self.dtype, name="flow_conv")(movement_feat)
        t = t.astype(flow.dtype)
        feat_t_from_x = fwarp(x, flow * t, None, "avg")

        h = jnp.concatenate([feat_t_from_x, movement_feat, flow], axis=-1)
        h = ConvPReLU(Cin, dtype=self.dtype, name="om1")(h)
        h = ConvPReLU(Cin, dtype=self.dtype, name="om2")(h)
        om = conv(G * 3 * KK, kernel_init=zero_init, bias_init=zero_init,
                  dtype=self.dtype, name="om_out")(h)

        om = om.reshape(B, H, W, G, 3, KK)
        res = 2.0 * jnp.tanh(jnp.stack([om[..., 0, :], om[..., 1, :]],
                                       axis=-1))
        offset = res - t[:, :, :, None, None, :] * flow[:, :, :, None, None, :]
        mask = jax.nn.sigmoid(om[..., 2, :])

        def _w_init(key, shape, dtype=jnp.float32):
            bound = (1.0 / (Cg * KK)) ** 0.5
            return jax.random.uniform(key, shape, dtype, -bound, bound)

        weight = self.param("weight", _w_init, (G, KK, Cg, CoutG),
                            jnp.float32)
        bias = self.param("bias", zero_init, (self.features,), jnp.float32)
        out = deform_conv2d(x, offset, mask, weight, bias,
                            kernel_size=K, padding=self.padding)
        return out, flow
