"""DCNTrans: DCN query building at 1/8 + sine-PE Swin decoding (reference
``models/archive/DCNTrans.py``).

v1 builds the coarse query with backward-warp DCNs (no t conditioning);
v2 with forward-splat DCNs (t-scaled flows). Both decode with two
8-deep Swin cross-attention stacks and a PixelShuffle generator, and train
with census + geometry + robust flow distillation on the DCN offset flows.

The reference's broken pieces fixed here: ``make_layer`` (undefined; it is
``make_residual_layers``) and ``DeformableConv2dwithFwarpv2`` (symbol
deleted from ``modules/dcnv2.py``; reconstructed as
``nn.dcn_layer.DeformableConv2dWithFwarp``).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..nn.blocks import ConvPReLU, PReLU, ResBlocks, conv, conv_transpose_x2
from ..nn.dcn_layer import DeformableConv2d, DeformableConv2dWithFwarp
from ..nn.position import position_embedding_sine
from ..nn.swin import SwinDecoder
from ..ops import (
    charbonnier_ada,
    charbonnier_l1,
    geometry_loss,
    get_robust_weight,
    pixel_shuffle,
    resize_bilinear,
    ternary_loss,
)

Array = jax.Array


class DCNInterFeatBuilder(nn.Module):
    """t-free variant of the coarse query builder (``DCNTrans.py:12-39``)."""

    features: int
    use_fwarp: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, feat0, feat1, t=None):
        nf = self.features
        motion = nn.Sequential([
            ConvPReLU(nf, dtype=self.dtype, name="motion1"),
            ConvPReLU(nf, dtype=self.dtype, name="motion2"),
        ])
        m01 = motion(jnp.concatenate([feat0, feat1], axis=-1))
        m10 = motion(jnp.concatenate([feat1, feat0], axis=-1))
        if self.use_fwarp:
            ft0, f01 = DeformableConv2dWithFwarp(
                nf, dtype=self.dtype, name="dcn0t")(feat0, t, m01)
            ft1, f10 = DeformableConv2dWithFwarp(
                nf, dtype=self.dtype, name="dcn1t")(feat1, 1.0 - t, m10)
        else:
            ft0, f01 = DeformableConv2d(nf, dtype=self.dtype, name="dcn0t")(
                feat0, m01)
            ft1, f10 = DeformableConv2d(nf, dtype=self.dtype, name="dcn1t")(
                feat1, m10)
        h = jnp.concatenate([ft0, ft1], axis=-1)
        h = ConvPReLU(nf, dtype=self.dtype, name="blend1")(h)
        out = conv(nf, dtype=self.dtype, name="blend2")(h)
        return out, f01, f10


class DCNTrans(nn.Module):
    """``DCNTransv1`` (v2 via ``use_fwarp=True``)."""

    nf: int = 64
    enc_res_blocks: int = 5
    dec_res_blocks: int = 10
    mlp_ratio: float = 2.0
    use_fwarp: bool = False  # v2
    dtype: Any = None

    def setup(self):
        nf = self.nf
        self.conv_first_a = ConvPReLU(nf, stride=1, dtype=self.dtype)
        self.conv_first_b = ConvPReLU(nf, stride=2, dtype=self.dtype)
        self.feature_extraction = ResBlocks(nf, self.enc_res_blocks,
                                            dtype=self.dtype)
        self.l2a = ConvPReLU(nf, stride=2, dtype=self.dtype)
        self.l2b = ConvPReLU(nf, stride=1, dtype=self.dtype)
        self.l3a = ConvPReLU(nf, stride=2, dtype=self.dtype)
        self.l3b = ConvPReLU(nf, stride=1, dtype=self.dtype)

        self.dcn_builder = DCNInterFeatBuilder(nf, self.use_fwarp,
                                               dtype=self.dtype)
        self.query_builder2 = conv_transpose_x2(nf, dtype=self.dtype)
        self.decoder2 = SwinDecoder(nf, depth=8, num_heads=8, window_size=4,
                                    mlp_ratio=self.mlp_ratio, dtype=self.dtype)
        self.query_builder1 = conv_transpose_x2(nf, dtype=self.dtype)
        self.decoder1 = SwinDecoder(nf, depth=8, num_heads=4, window_size=4,
                                    mlp_ratio=self.mlp_ratio, dtype=self.dtype)

        self.reconstruction = ResBlocks(nf, self.dec_res_blocks,
                                        dtype=self.dtype)
        self.upconv1 = conv(nf * 4, dtype=self.dtype)
        self.prelu1 = PReLU(nf)
        self.hrconv = conv(nf, dtype=self.dtype)
        self.prelu2 = PReLU(nf)
        self.conv_last = conv(3, dtype=self.dtype)

    def extract_feature(self, x):
        f1 = self.feature_extraction(self.conv_first_b(self.conv_first_a(x)))
        f2 = self.l2b(self.l2a(f1))
        f3 = self.l3b(self.l3a(f2))
        return f1, f2, f3

    def _rgb(self, feat, mean):
        out = self.reconstruction(feat)
        out = self.prelu1(pixel_shuffle(self.upconv1(out), 2))
        out = self.prelu2(self.hrconv(out))
        out = self.conv_last(out)
        return jnp.clip((out + mean.astype(out.dtype)).astype(jnp.float32),
                        0, 1)

    def __call__(self, x0, x1, t, train: bool = False):
        # DCNTrans normalizes with per-image spatial means (DCNTrans.py:131).
        mean = 0.5 * (jnp.mean(x0, axis=(1, 2), keepdims=True)
                      + jnp.mean(x1, axis=(1, 2), keepdims=True))
        x0n, x1n = x0 - mean, x1 - mean
        if self.dtype is not None:
            x0n = x0n.astype(self.dtype)
            x1n = x1n.astype(self.dtype)

        f0_1, f0_2, f0_3 = self.extract_feature(x0n)
        f1_1, f1_2, f1_3 = self.extract_feature(x1n)

        feat_t_3, f01_off, f10_off = self.dcn_builder(
            f0_3, f1_3, t.astype(x0n.dtype))
        feat_t_2q = self.query_builder2(feat_t_3)

        pos = position_embedding_sine(
            feat_t_2q.shape[1], feat_t_2q.shape[2], self.nf // 2,
            dtype=feat_t_2q.dtype,
        )
        feat_t_2 = self.decoder2(feat_t_2q + pos, f0_2 + pos, f1_2 + pos)
        feat_t_1 = self.decoder1(self.query_builder1(feat_t_2), f0_1, f1_1)

        pred = self._rgb(feat_t_1, mean)
        if not train:
            return pred
        return pred, {
            "feat_t_3": feat_t_3, "feat_t_2": feat_t_2q,
            "f01_off": f01_off.astype(jnp.float32),
            "f10_off": f10_off.astype(jnp.float32),
            "mean": mean,
        }

    def encode(self, x):
        return self.extract_feature(x)


def dcntrans_loss(model, params, pred, inter, batch) -> tuple[Array, dict]:
    """``DCNTrans.py:154-171``: census + geometry on query features vs
    GT-frame features + robust distillation of 8x-upscaled offset flows."""
    xt = batch["xt"]
    mean = inter["mean"]
    _, ft_2, ft_3 = model.apply(params, xt - mean, method=DCNTrans.encode)

    l1 = charbonnier_l1(pred - xt)
    census = ternary_loss(pred, xt)
    geo = 0.01 * (
        geometry_loss(inter["feat_t_3"].astype(jnp.float32),
                      ft_3.astype(jnp.float32))
        + geometry_loss(inter["feat_t_2"].astype(jnp.float32),
                        ft_2.astype(jnp.float32))
    )

    def up8(f):
        B, H, W, C = f.shape
        return resize_bilinear(f, (H * 8, W * 8), align_corners=True) * 8.0

    p01, p10 = up8(inter["f01_off"]), up8(inter["f10_off"])
    w0 = get_robust_weight(p01, batch["f0x"], beta=0.3)
    w1 = get_robust_weight(p10, batch["f1x"], beta=0.3)
    distill = 0.01 * (charbonnier_ada(p01 - batch["f0x"], w0)
                      + charbonnier_ada(p10 - batch["f1x"], w1))

    total = l1 + census + geo + distill
    return total, {
        "total_loss": total, "l1_loss": l1, "census_loss": census,
        "geometry_loss": geo, "flow_loss": distill,
    }
