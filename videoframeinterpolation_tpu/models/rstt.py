"""RSTT: coarse flow + flow-reversal query + Swin decoder stack with an
auto-encoding auxiliary loss (reference ``models/archive/RSTT.py``).

The query at 1/8 is built by backward-warping both frames' features with
*reversed* flows obtained by softmax-splatting the forward flow to time t:
``ft0 = -fwarp(f01, f01*t, z0) * t`` (``RSTT.py:74-78``).

Reference quirk fixed (documented): ``RSTT.py:75`` splats ``f10`` along
``f01*(1-t)`` — the other frame's flow field; we splat along
``f10*(1-t)``.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..nn import IFRNetEncoder
from ..nn.blocks import ConvPReLU, conv, conv_transpose_x2
from ..nn.swin import SwinDecoder
from ..models.m2m import _DecoderBlock
from ..ops import (
    bwarp,
    charbonnier_l1,
    fwarp,
    geometry_loss,
    pixel_shuffle,
    resize_bilinear,
    ternary_loss,
)

Array = jax.Array


def _resize(x: Array, scale: float) -> Array:
    B, H, W, C = x.shape
    return resize_bilinear(x, (int(H * scale), int(W * scale)),
                           align_corners=True)


class RSTT(nn.Module):
    channels: tuple = (32, 48, 72, 96)
    dtype: Any = None

    def setup(self):
        c1, c2, c3, c4 = self.channels
        self.encoder = IFRNetEncoder(self.channels, dtype=self.dtype)
        self.decoder4 = _DecoderBlock(2 * c4, 4, dtype=self.dtype)
        self.query_builder3 = conv(c3, dtype=self.dtype)
        self.decoder3 = SwinDecoder(c3, depth=6, num_heads=6, window_size=4,
                                    dtype=self.dtype)
        self.query_builder2 = conv_transpose_x2(c2, dtype=self.dtype)
        self.decoder2 = SwinDecoder(c2, depth=6, num_heads=6, window_size=4,
                                    dtype=self.dtype)
        self.query_builder1 = conv_transpose_x2(c1, dtype=self.dtype)
        self.decoder1 = SwinDecoder(c1, depth=4, num_heads=4, window_size=2,
                                    dtype=self.dtype)
        self.upconv1 = conv(c1 * 4, dtype=self.dtype)
        self.hrconv = conv(c1, dtype=self.dtype)
        self.conv_last = conv(3, dtype=self.dtype)

    def _rgb(self, feat, mean):
        out = pixel_shuffle(self.upconv1(feat), 2)
        out = nn.leaky_relu(out, 0.1)
        out = nn.leaky_relu(self.hrconv(out), 0.1)
        out = self.conv_last(out)
        return jnp.clip((out + mean.astype(out.dtype)).astype(jnp.float32),
                        0, 1)

    def __call__(self, x0, x1, t, train: bool = False):
        m0 = jnp.mean(x0, axis=(1, 2, 3), keepdims=True)
        m1 = jnp.mean(x1, axis=(1, 2, 3), keepdims=True)
        mean = 0.5 * (m0 + m1)
        x0n, x1n = x0 - mean, x1 - mean
        if self.dtype is not None:
            x0n = x0n.astype(self.dtype)
            x1n = x1n.astype(self.dtype)
        tt = t.astype(x0n.dtype)

        f0 = self.encoder(x0n)
        f1 = self.encoder(x1n)

        out4 = self.decoder4(jnp.concatenate([f0[3], f1[3]], axis=-1))
        f01_4, f10_4 = out4[..., 0:2], out4[..., 2:4]

        x0_4 = _resize(x0n, 1 / 8)
        x1_4 = _resize(x1n, 1 / 8)
        z0_4 = jnp.square(jnp.clip(
            1.0 - jnp.mean(jnp.abs(x0_4 - bwarp(x1_4, f01_4)), -1,
                           keepdims=True), 0.001, None))
        z1_4 = jnp.square(jnp.clip(
            1.0 - jnp.mean(jnp.abs(x1_4 - bwarp(x0_4, f10_4)), -1,
                           keepdims=True), 0.001, None))

        # Flow-reversal query (RSTT.py:74-78, with the f10 typo fixed).
        ft0_3 = -fwarp(f01_4, f01_4 * tt, z0_4) * tt
        ft1_3 = -fwarp(f10_4, f10_4 * (1.0 - tt), z1_4) * (1.0 - tt)
        q3 = self.query_builder3(jnp.concatenate(
            [bwarp(f0[2], ft0_3), bwarp(f1[2], ft1_3)], axis=-1))

        feat_t_3 = self.decoder3(q3, f0[2], f1[2])
        feat_t_2 = self.decoder2(self.query_builder2(feat_t_3), f0[1], f1[1])
        feat_t_1 = self.decoder1(self.query_builder1(feat_t_2), f0[0], f1[0])

        pred = self._rgb(feat_t_1, mean)
        if not train:
            return pred
        return pred, {
            "feats_t": [feat_t_1, feat_t_2, feat_t_3],
            "f0_1": f0[0], "f1_1": f1[0],
            "pred_f01": (_resize(f01_4, 8.0) * 8.0).astype(jnp.float32),
            "pred_f10": (_resize(f10_4, 8.0) * 8.0).astype(jnp.float32),
            "mean": mean,
        }

    def rgb_head(self, feat, mean):
        """Expose the RGB head for the auto-encoding auxiliary loss."""
        return self._rgb(feat, mean)

    def encode(self, x):
        return self.encoder(x)


def rstt_loss(model, params, pred, inter, batch) -> tuple[Array, dict]:
    """``RSTT.py:94-121``: interpolation + auto-encoding photometric losses,
    geometry loss vs GT-frame features, MSE flow distillation."""
    xt = batch["xt"]
    mean = inter["mean"]

    x0_pred = model.apply(params, inter["f0_1"], mean, method=RSTT.rgb_head)
    x1_pred = model.apply(params, inter["f1_1"], mean, method=RSTT.rgb_head)

    gt_feats = model.apply(params, xt - mean, method=RSTT.encode)

    l1_inter = charbonnier_l1(pred - xt)
    l1_origin = (charbonnier_l1(x0_pred - batch["x0"])
                 + charbonnier_l1(x1_pred - batch["x1"]))
    census_inter = ternary_loss(pred, xt)
    census_origin = (ternary_loss(x0_pred, batch["x0"])
                     + ternary_loss(x1_pred, batch["x1"]))

    geo = 0.01 * sum(
        geometry_loss(ft.astype(jnp.float32), gt.astype(jnp.float32))
        for ft, gt in zip(inter["feats_t"], gt_feats[:3])
    )
    distill = 0.01 * (
        jnp.mean((inter["pred_f01"] - batch["f0x"]) ** 2)
        + jnp.mean((inter["pred_f10"] - batch["f1x"]) ** 2)
    )
    total = (l1_origin + l1_inter + census_origin + census_inter
             + geo + distill)
    return total, {
        "total_loss": total, "l1_loss": l1_inter, "l1_origin": l1_origin,
        "census_loss": census_inter, "census_origin": census_origin,
        "flow_loss": distill, "geometry_loss": geo,
    }
