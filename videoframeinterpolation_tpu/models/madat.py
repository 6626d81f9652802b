"""MADAT: motion-from-attention coarse flow + motion-aware deformable
attention decoding (reference ``models/archive/MADAT.py``).

The archive version is broken: it imports ``modules.refine.Unet`` which does
not exist (``MADAT.py:9``) and uses loss members that are never constructed
(``MADAT.py:235-236``). Both are repaired here: a compact UNet RGB builder
fusing the per-level intermediate features, and the standard
Charbonnier + census photometric loss.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..nn.blocks import ConvPReLU, PReLU, conv, conv_transpose_x2
from ..nn.madat import (
    DATWithMotionEstimation,
    FlowSelfAttnPropagation,
    InterFrameAttention,
)
from ..ops import (
    bwarp,
    charbonnier_l1,
    fwarp_using_two_frames,
    resize_bilinear,
    ternary_loss,
)

Array = jax.Array


def _resize(x: Array, scale: float) -> Array:
    B, H, W, C = x.shape
    return resize_bilinear(x, (int(H * scale), int(W * scale)),
                           align_corners=True)


class FeatPyramid(nn.Module):
    """Plain conv pyramid (``MADAT.py:76-100``)."""

    channels: Sequence[int] = (16, 32, 64)
    depths: Sequence[int] = (3, 3, 3)
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array):
        outs = []
        for i, (c, d) in enumerate(zip(self.channels, self.depths)):
            x = ConvPReLU(c, stride=2, dtype=self.dtype, name=f"b{i}_down")(x)
            for j in range(d - 1):
                x = ConvPReLU(c, stride=1, dtype=self.dtype,
                              name=f"b{i}_c{j}")(x)
            outs.append(x)
        return outs


class UNetRGBBuilder(nn.Module):
    """RGB head fusing warped frames with the decoder's multi-scale
    intermediate features (reconstruction of the missing
    ``modules.refine.Unet``, ``MADAT.py:9,167``)."""

    channels: Sequence[int] = (16, 32, 64)
    dtype: Any = None

    @nn.compact
    def __call__(self, xt_from_x0: Array, xt_from_x1: Array,
                 feats_t: Sequence[Array]) -> Array:
        c1, c2, c3 = self.channels
        x = jnp.concatenate([xt_from_x0, xt_from_x1], axis=-1)
        d0 = ConvPReLU(c1, stride=1, dtype=self.dtype, name="in")(x)
        # Down path, fusing feats_t (ordered fine -> coarse: 1/2, 1/4, 1/8).
        d1 = ConvPReLU(c1, stride=2, dtype=self.dtype, name="down1")(d0)
        d1 = ConvPReLU(c1, dtype=self.dtype, name="fuse1")(
            jnp.concatenate([d1, feats_t[0]], axis=-1))
        d2 = ConvPReLU(c2, stride=2, dtype=self.dtype, name="down2")(d1)
        d2 = ConvPReLU(c2, dtype=self.dtype, name="fuse2")(
            jnp.concatenate([d2, feats_t[1]], axis=-1))
        d3 = ConvPReLU(c3, stride=2, dtype=self.dtype, name="down3")(d2)
        d3 = ConvPReLU(c3, dtype=self.dtype, name="fuse3")(
            jnp.concatenate([d3, feats_t[2]], axis=-1))
        # Up path with skips.
        u2 = conv_transpose_x2(c2, dtype=self.dtype, name="up2")(d3)
        u2 = ConvPReLU(c2, dtype=self.dtype, name="mix2")(
            jnp.concatenate([u2, d2], axis=-1))
        u1 = conv_transpose_x2(c1, dtype=self.dtype, name="up1")(u2)
        u1 = ConvPReLU(c1, dtype=self.dtype, name="mix1")(
            jnp.concatenate([u1, d1], axis=-1))
        u0 = conv_transpose_x2(c1, dtype=self.dtype, name="up0")(u1)
        u0 = ConvPReLU(c1, dtype=self.dtype, name="mix0")(
            jnp.concatenate([u0, d0], axis=-1))
        return conv(3, dtype=self.dtype, name="out")(u0)


class MADAT(nn.Module):
    channels: Sequence[int] = (16, 32, 64)
    depths: Sequence[int] = (3, 3, 3)
    motion_dim: int = 64
    mlp_ratio: float = 2.0
    dtype: Any = None

    def setup(self):
        c1, c2, c3 = self.channels
        self.encoder = FeatPyramid(self.channels, self.depths,
                                   dtype=self.dtype)
        self.corr = InterFrameAttention(c3, self.motion_dim,
                                        mlp_ratio=self.mlp_ratio,
                                        dtype=self.dtype)
        md = self.motion_dim
        self.motions2bwarpflow = nn.Sequential([
            ConvPReLU(md, dtype=self.dtype, name="m2b1"),
            ConvPReLU(md // 2, dtype=self.dtype, name="m2b2"),
            conv(4, dtype=self.dtype, name="m2b3"),
        ])
        self.motion2flow = nn.Sequential([
            ConvPReLU(md // 2, dtype=self.dtype, name="m2f1"),
            ConvPReLU(md // 2, dtype=self.dtype, name="m2f2"),
            conv(2, dtype=self.dtype, name="m2f3"),
        ])
        self.self_attn3 = FlowSelfAttnPropagation(c3, dtype=self.dtype)
        self.query_builder2 = conv_transpose_x2(c2, dtype=self.dtype)
        self.decoder2 = DATWithMotionEstimation(
            c2, c2, n_samples=9, n_groups=4, n_heads=4,
            mlp_ratio=self.mlp_ratio, motion_dim=md, dtype=self.dtype)
        self.self_attn2 = FlowSelfAttnPropagation(c2, dtype=self.dtype)
        self.query_builder1 = conv_transpose_x2(c1, dtype=self.dtype)
        self.decoder1 = DATWithMotionEstimation(
            c1, c1, n_samples=9, n_groups=8, n_heads=8,
            mlp_ratio=self.mlp_ratio, motion_dim=md, dtype=self.dtype)
        self.self_attn1 = FlowSelfAttnPropagation(c1, dtype=self.dtype)
        self.rgb_builder = UNetRGBBuilder(self.channels, dtype=self.dtype)

    def __call__(self, x0, x1, t, train: bool = False):
        m0 = jnp.mean(x0, axis=(1, 2, 3), keepdims=True)
        m1 = jnp.mean(x1, axis=(1, 2, 3), keepdims=True)
        mean = 0.5 * (m0 + m1)
        x0n, x1n = x0 - mean, x1 - mean
        if self.dtype is not None:
            x0n = x0n.astype(self.dtype)
            x1n = x1n.astype(self.dtype)
        tt = t.astype(x0n.dtype)

        f0_1, f0_2, f0_3 = self.encoder(x0n)
        f1_1, f1_2, f1_3 = self.encoder(x1n)
        B, fh, fw, _ = f0_3.shape

        attended, motion = self.corr(f0_3, f1_3)
        att0, att1 = jnp.split(attended, 2, axis=0)
        motion01, motion10 = jnp.split(motion, 2, axis=0)
        motion_0t = motion01 * tt
        motion_1t = motion10 * (1.0 - tt)
        flows = self.motion2flow(
            jnp.concatenate([motion_0t, motion_1t], axis=0))
        f0t_3, f1t_3 = jnp.split(flows, 2, axis=0)

        ones = jnp.ones((B, fh, fw, 1), att0.dtype)
        feat_t_3, _ = fwarp_using_two_frames(
            att0, f0t_3, tt, att1, f1t_3, 1.0 - tt, ones, ones)

        bflows = self.motions2bwarpflow(
            jnp.concatenate([motion_0t, motion_1t, feat_t_3], axis=-1))
        ft0_3, ft1_3 = bflows[..., 0:2], bflows[..., 2:4]
        sa_feat_t_3, ft0_3, ft1_3 = self.self_attn3(feat_t_3, ft0_3, ft1_3)

        def level(query_builder, decoder, self_attn, sa_feat, f0l, f1l,
                  ft0, ft1, prev_f0, prev_f1):
            q = query_builder(jnp.concatenate(
                [bwarp(prev_f0, ft0), sa_feat, bwarp(prev_f1, ft1)],
                axis=-1))
            up0 = _resize(ft0, 2.0) * 2.0
            up1 = _resize(ft1, 2.0) * 2.0
            feat, mt0, mt1 = decoder(q, f0l, f1l, up0, up1)
            res = self.motion2flow(jnp.concatenate([mt0, mt1], axis=0))
            r0, r1 = jnp.split(res, 2, axis=0)
            return self_attn(feat, up0 + r0, up1 + r1)

        sa_feat_t_2, ft0_2, ft1_2 = level(
            self.query_builder2, self.decoder2, self.self_attn2,
            sa_feat_t_3, f0_2, f1_2, ft0_3, ft1_3, f0_3, f1_3)
        sa_feat_t_1, ft0_1, ft1_1 = level(
            self.query_builder1, self.decoder1, self.self_attn1,
            sa_feat_t_2, f0_1, f1_1, ft0_2, ft1_2, f0_2, f1_2)

        up_ft0_1 = _resize(ft0_1, 2.0) * 2.0
        up_ft1_1 = _resize(ft1_1, 2.0) * 2.0
        xt_from_x0 = bwarp(x0n, up_ft0_1)
        xt_from_x1 = bwarp(x1n, up_ft1_1)

        rgb = self.rgb_builder(xt_from_x0, xt_from_x1,
                               [sa_feat_t_1, sa_feat_t_2, sa_feat_t_3])
        pred = jnp.clip(
            (rgb + mean.astype(rgb.dtype)).astype(jnp.float32), 0, 1)
        if not train:
            return pred
        return pred, {
            "ft0": [up_ft0_1, ft0_2, ft0_3],
            "ft1": [up_ft1_1, ft1_2, ft1_3],
        }


def madat_loss(pred, inter, batch) -> tuple[Array, dict]:
    """Photometric-only loss (``MADAT.py:234-237``, with the never-
    constructed loss members repaired)."""
    xt = batch["xt"]
    l1 = charbonnier_l1(pred - xt)
    census = ternary_loss(pred, xt)
    total = l1 + census
    return total, {"total_loss": total, "l1_loss": l1, "census_loss": census}
