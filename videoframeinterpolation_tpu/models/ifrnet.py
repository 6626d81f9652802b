"""IFRNet baseline: coarse-to-fine flow + residual decoding.

Re-design of the archived reference IFRNet (``models/archive/IFRNet.py``),
the self-contained canonical coarse-to-fine VFI model: growing-channel
pyramid encoder, four decoders that predict bidirectional flows, a blend
mask and a residual, merged as
``mask * warp(x0) + (1-mask) * warp(x1) + mean + residual``.

Deviations from the archive (documented, intentional):
  * inputs are [0, 1] floats (the archive divides by 255 a second time on
    top of the dataset's division — a stale-code artifact,
    ``models/archive/IFRNet.py:196`` vs ``data/Vimeo90K.py:35``);
  * flow ground truth arrives via batch keys ``f0x``/``f1x`` like every
    other model here (the archive used ``f01``/``f10``).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..nn import IFRNetEncoder
from ..nn.blocks import ConvPReLU, HalfChannelConv5ResBlock, conv_transpose_x2
from ..ops import (
    bwarp,
    charbonnier_ada,
    charbonnier_l1,
    geometry_loss,
    get_robust_weight,
    resize_bilinear,
    ternary_loss,
)

Array = jax.Array


def _resize_flow(flow: Array, scale: float) -> Array:
    """IFRNet's resize: bilinear align_corners=False, values NOT rescaled
    (models/archive/IFRNet.py:6-8); callers multiply magnitudes themselves."""
    B, H, W, C = flow.shape
    return resize_bilinear(
        flow, (int(H * scale), int(W * scale)), align_corners=False
    )


class _Decoder(nn.Module):
    """convPReLU -> side-channel ResBlock -> ConvTranspose 2x upsample."""

    mid_features: int
    out_features: int
    side_features: int = 32
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        h = ConvPReLU(self.mid_features, dtype=self.dtype, name="conv_in")(x)
        h = HalfChannelConv5ResBlock(
            self.mid_features, min(self.side_features, self.mid_features // 2),
            final_activation=False, dtype=self.dtype, name="resblock",
        )(h)
        return conv_transpose_x2(self.out_features, dtype=self.dtype,
                                 name="up")(h)


class IFRNet(nn.Module):
    channels: tuple = (32, 48, 72, 96)
    dtype: Any = None

    def setup(self):
        c1, c2, c3, c4 = self.channels
        self.encoder = IFRNetEncoder(self.channels, dtype=self.dtype)
        # With the default pyramid this reproduces the archive's widths
        # (models/archive/IFRNet.py:82-147): Decoder4 mid 192 = 2*c4,
        # out 76 = 4 flow + c3 feat; Decoder3 mid 216 = 3*c3, out 52 = 4+c2;
        # Decoder2 mid 144 = 3*c2, out 36 = 4+c1; Decoder1 mid 96 = 3*c1,
        # out 8 = 4 flow + 1 mask + 3 residual.
        self.decoder4 = _Decoder(2 * c4, 4 + c3, dtype=self.dtype)
        self.decoder3 = _Decoder(3 * c3, 4 + c2, dtype=self.dtype)
        self.decoder2 = _Decoder(3 * c2, 4 + c1, dtype=self.dtype)
        self.decoder1 = _Decoder(3 * c1, 8, dtype=self.dtype)

    def __call__(self, x0: Array, x1: Array, t: Array, train: bool = False):
        B = x0.shape[0]
        m0 = jnp.mean(x0, axis=(1, 2, 3), keepdims=True)
        m1 = jnp.mean(x1, axis=(1, 2, 3), keepdims=True)
        mean = 0.5 * (m0 + m1)
        x0n = (x0 - mean)
        x1n = (x1 - mean)
        if self.dtype is not None:
            x0n = x0n.astype(self.dtype)
            x1n = x1n.astype(self.dtype)

        f0_1, f0_2, f0_3, f0_4 = self.encoder(x0n)
        f1_1, f1_2, f1_3, f1_4 = self.encoder(x1n)

        h4, w4 = f0_4.shape[1], f0_4.shape[2]
        embt = jnp.broadcast_to(t.astype(f0_4.dtype), (B, h4, w4, 1))
        out4 = self.decoder4(jnp.concatenate([f0_4, f1_4, embt], axis=-1))
        up_flow0_4, up_flow1_4, ft_3 = out4[..., 0:2], out4[..., 2:4], out4[..., 4:]

        def dec_step(decoder, ft_, fa, fb, fl0, fl1):
            f0w = bwarp(fa, fl0)
            f1w = bwarp(fb, fl1)
            return decoder(
                jnp.concatenate([ft_, f0w, f1w, fl0, fl1], axis=-1)
            )

        out3 = dec_step(self.decoder3, ft_3, f0_3, f1_3, up_flow0_4, up_flow1_4)
        up_flow0_3 = out3[..., 0:2] + 2.0 * _resize_flow(up_flow0_4, 2.0)
        up_flow1_3 = out3[..., 2:4] + 2.0 * _resize_flow(up_flow1_4, 2.0)
        ft_2 = out3[..., 4:]

        out2 = dec_step(self.decoder2, ft_2, f0_2, f1_2, up_flow0_3, up_flow1_3)
        up_flow0_2 = out2[..., 0:2] + 2.0 * _resize_flow(up_flow0_3, 2.0)
        up_flow1_2 = out2[..., 2:4] + 2.0 * _resize_flow(up_flow1_3, 2.0)
        ft_1 = out2[..., 4:]

        out1 = dec_step(self.decoder1, ft_1, f0_1, f1_1, up_flow0_2, up_flow1_2)
        up_flow0_1 = out1[..., 0:2] + 2.0 * _resize_flow(up_flow0_2, 2.0)
        up_flow1_1 = out1[..., 2:4] + 2.0 * _resize_flow(up_flow1_2, 2.0)
        up_mask_1 = jax.nn.sigmoid(out1[..., 4:5])
        up_res_1 = out1[..., 5:]

        x0_warp = bwarp(x0n, up_flow0_1)
        x1_warp = bwarp(x1n, up_flow1_1)
        merged = (
            up_mask_1 * x0_warp + (1.0 - up_mask_1) * x1_warp
            + mean.astype(x0_warp.dtype)
        )
        img_pred = jnp.clip((merged + up_res_1).astype(jnp.float32), 0.0, 1.0)

        if not train:
            return img_pred

        intermediates = {
            "flows0": [up_flow0_1, up_flow0_2, up_flow0_3, up_flow0_4],
            "flows1": [up_flow1_1, up_flow1_2, up_flow1_3, up_flow1_4],
            "feats_t": [ft_1, ft_2, ft_3],
            "mask": up_mask_1,
            "x0_warp": x0_warp,
            "x1_warp": x1_warp,
            "mean": mean,
        }
        return img_pred, intermediates

    def encode(self, x: Array) -> tuple[Array, ...]:
        """Encode a (mean-normalized) frame; used by the geometry loss."""
        return self.encoder(x)


def ifrnet_loss(
    img_pred: Array,
    intermediates: dict,
    batch: dict,
    gt_feats: tuple[Array, ...],
    geo_lambda: float = 0.01,
    distill_lambda: float = 0.01,
) -> tuple[Array, dict]:
    """IFRNet training loss (``models/archive/IFRNet.py:238-256``).

    Args:
      gt_feats: encoder features of the mean-normalized ground-truth frame
        (computed by the caller with ``model.encode``).
    """
    xt = batch["xt"]
    f01, f10 = batch["f0x"], batch["f1x"]

    l1 = charbonnier_l1(img_pred - xt)
    census = ternary_loss(img_pred, xt)

    feats_t = [f.astype(jnp.float32) for f in intermediates["feats_t"]]
    geo = geo_lambda * sum(
        geometry_loss(ft_, gt.astype(jnp.float32))
        for ft_, gt in zip(feats_t, gt_feats[:3])
    )

    flows0 = [f.astype(jnp.float32) for f in intermediates["flows0"]]
    flows1 = [f.astype(jnp.float32) for f in intermediates["flows1"]]
    w0 = get_robust_weight(flows0[0], f01, beta=0.3)
    w1 = get_robust_weight(flows1[0], f10, beta=0.3)
    distill = distill_lambda * (
        charbonnier_ada(2.0 * _resize_flow(flows0[1], 2.0) - f01, w0)
        + charbonnier_ada(2.0 * _resize_flow(flows1[1], 2.0) - f10, w1)
        + charbonnier_ada(4.0 * _resize_flow(flows0[2], 4.0) - f01, w0)
        + charbonnier_ada(4.0 * _resize_flow(flows1[2], 4.0) - f10, w1)
        + charbonnier_ada(8.0 * _resize_flow(flows0[3], 8.0) - f01, w0)
        + charbonnier_ada(8.0 * _resize_flow(flows1[3], 8.0) - f10, w1)
    )

    total = l1 + census + geo + distill
    return total, {
        "total_loss": total,
        "l1_loss": l1,
        "census_loss": census,
        "flow_loss": distill,
        "geometry_loss": geo,
    }
