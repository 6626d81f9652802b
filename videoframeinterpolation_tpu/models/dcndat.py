"""DCNDAT: deformable attention with DCN-enhanced queries (reference
``models/archive/DCNDAT.py``) — the flagship's closest ancestor.

Differences from the flagship DAT: the attention's sampling offsets + mask
also drive a ``DeformableConv2dGivenOffset`` (kernel taps = the n_samples=9
attention samples) that builds an enhanced query from each frame, blended
1x1 with the incoming query (``DCNDAT.py:173-185``); the coarse query
builder shares ONE DCN between directions (``DCNDAT.py:94-107``); and the
distillation loss scales flow magnitudes correctly per level
(``DCNDAT.py:296-301``), unlike the flagship.

The archive file is import-broken (``models.base.Basemodel``,
``modules.deformable_attn.DeformAttn``, ``make_layer``, ``utils.resize`` all
missing); this is the repaired re-design.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..nn import SameChannelResEncoder
from ..nn.blocks import (
    ConvPReLU,
    FeedForward,
    HalfChannelConv5ResBlock,
    conv,
    conv_transpose_x2,
    zero_init,
)
from ..nn.dcn_layer import DeformableConv2d
from ..nn.deformable_attn import SampleAttention, _grouped_deformable_sample
from ..nn.generator import BasicResPixelShuffleGenerator
from ..ops import (
    bwarp,
    charbonnier_ada,
    charbonnier_l1,
    deform_conv2d,
    geometry_loss,
    get_robust_weight,
    resize_bilinear,
    scale_resize,
    ternary_loss,
)
from .base import norm_w_rgb_mean

Array = jax.Array


class DeformableConv2dGivenOffset(nn.Module):
    """Deformable conv whose offsets/mask are supplied by the caller
    (``DCNDAT.py:57-78``); requires ``n_samples == kernel_size**2``."""

    features: int
    kernel_size: int = 3
    padding: int = 1
    groups: int = 8
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array, offset: Array, mask_logits: Array) -> Array:
        B, H, W, Cin = x.shape
        G, K = self.groups, self.kernel_size
        KK = K * K
        Cg = Cin // G
        CoutG = self.features // G

        def _w_init(key, shape, dtype=jnp.float32):
            bound = (1.0 / (Cg * KK)) ** 0.5
            return jax.random.uniform(key, shape, dtype, -bound, bound)

        weight = self.param("weight", _w_init, (G, KK, Cg, CoutG),
                            jnp.float32)
        bias = self.param("bias", zero_init, (self.features,), jnp.float32)
        mask = jax.nn.sigmoid(mask_logits)
        return deform_conv2d(x, offset, mask, weight, bias,
                             kernel_size=K, padding=self.padding)


class SharedDCNQueryBuilder(nn.Module):
    """t-conditioned builder with ONE shared DCN (``DCNDAT.py:81-109``)."""

    features: int
    dtype: Any = None

    @nn.compact
    def __call__(self, feat0, feat1, t):
        B, H, W, C = feat0.shape
        nf = self.features
        t_map = jnp.broadcast_to(t.astype(feat0.dtype), (B, H, W, 1))
        motion = nn.Sequential([
            ConvPReLU(nf, dtype=self.dtype, name="motion1"),
            ConvPReLU(nf, dtype=self.dtype, name="motion2"),
        ])
        m01 = motion(jnp.concatenate([feat0, feat1, t_map], axis=-1))
        m10 = motion(jnp.concatenate([feat1, feat0, 1.0 - t_map], axis=-1))
        dcn = DeformableConv2d(nf, dtype=self.dtype, name="dcn")
        ft_from_0, ft0 = dcn(feat0, m01)
        ft_from_1, ft1 = dcn(feat1, m10)
        h = jnp.concatenate([ft_from_0, ft_from_1], axis=-1)
        h = ConvPReLU(nf, dtype=self.dtype, name="blend1")(h)
        return conv(nf, dtype=self.dtype, name="blend2")(h), ft0, ft1


class DCNDATBlock(nn.Module):
    """Deformable attention + DCN query enhancement
    (``CrossDeformableAttentionBlockwFlow`` in ``DCNDAT.py:112-193``)."""

    features: int
    out_features: int
    n_samples: int = 9
    n_groups: int = 8
    n_heads: int = 8
    mlp_ratio: float = 2.0
    offset_scale: float = 2.0
    pred_res_flow: bool = True
    dtype: Any = None

    def setup(self):
        c = self.features
        self.movement_conv1 = ConvPReLU(c * 2, dtype=self.dtype)
        self.movement_conv2 = ConvPReLU(c, dtype=self.dtype)
        self.movement_res = HalfChannelConv5ResBlock(c, c // 2,
                                                     dtype=self.dtype)
        self.conv_res_offset_mask = conv(
            self.n_groups * self.n_samples * 3,
            kernel_init=zero_init, bias_init=zero_init, dtype=self.dtype,
            name="conv_res_offset_mask",
        )
        if self.pred_res_flow:
            self.conv_res_flow = conv_transpose_x2(2, dtype=self.dtype)
        self.query_enhancer = DeformableConv2dGivenOffset(
            self.out_features, groups=self.n_groups, dtype=self.dtype)
        self.query_blender = nn.Dense(c, dtype=self.dtype)
        self.attn = SampleAttention(self.out_features, self.n_samples * 2,
                                    self.n_heads, dtype=self.dtype)
        self.mlp = FeedForward(int(self.out_features * self.mlp_ratio),
                               self.out_features, dtype=self.dtype)

    def _movement(self, feat_t, feat_x, ftx):
        h = jnp.concatenate([feat_t, bwarp(feat_x, ftx), ftx], axis=-1)
        return self.movement_res(self.movement_conv2(self.movement_conv1(h)))

    def _offsets_mask(self, ftx, movement):
        B, H, W, _ = ftx.shape
        out = self.conv_res_offset_mask(movement)
        out = out.reshape(B, H, W, self.n_groups, 3, self.n_samples)
        res = self.offset_scale * jnp.tanh(
            jnp.stack([out[..., 0, :], out[..., 1, :]], axis=-1))
        offsets = res + ftx[:, :, :, None, None, :]
        return offsets, out[..., 2, :]

    def __call__(self, feat_t, feat0, feat1, ft0, ft1):
        mv0 = self._movement(feat_t, feat0, ft0)
        off0, mask0 = self._offsets_mask(ft0, mv0)
        mv1 = self._movement(feat_t, feat1, ft1)
        off1, mask1 = self._offsets_mask(ft1, mv1)

        enh0 = self.query_enhancer(feat0, off0, mask0)
        enh1 = self.query_enhancer(feat1, off1, mask1)
        query = self.query_blender(
            jnp.concatenate([enh0, feat_t, enh1], axis=-1))

        kv0 = _grouped_deformable_sample(feat0, off0, self.n_groups)
        kv1 = _grouped_deformable_sample(feat1, off1, self.n_groups)
        attended = self.attn(query, jnp.concatenate([kv0, kv1], axis=1))
        out = attended + self.mlp(attended)

        if not self.pred_res_flow:
            return out
        up_ft0 = self.conv_res_flow(mv0) + 2.0 * scale_resize(ft0, 2.0)
        up_ft1 = self.conv_res_flow(mv1) + 2.0 * scale_resize(ft1, 2.0)
        return out, up_ft0, up_ft1


class DCNDAT(nn.Module):
    nf: int = 64
    enc_res_blocks: int = 5
    dec_res_blocks: int = 10
    mlp_ratio: float = 2.0
    dtype: Any = None

    def setup(self):
        nf = self.nf
        self.cnn_encoder = SameChannelResEncoder(nf, self.enc_res_blocks,
                                                 dtype=self.dtype)
        self.dcn_feat_t_builder = SharedDCNQueryBuilder(nf, dtype=self.dtype)
        self.query_builder3 = conv_transpose_x2(nf + 4, dtype=self.dtype)
        self.dat_scale3 = DCNDATBlock(nf, nf, n_samples=9, n_groups=8,
                                      n_heads=8, mlp_ratio=self.mlp_ratio,
                                      dtype=self.dtype)
        self.query_builder2 = conv_transpose_x2(nf, dtype=self.dtype)
        self.dat_scale2 = DCNDATBlock(nf, nf, n_samples=9, n_groups=4,
                                      n_heads=4, mlp_ratio=self.mlp_ratio,
                                      dtype=self.dtype)
        self.query_builder1 = conv_transpose_x2(nf, dtype=self.dtype)
        self.dat_scale1 = DCNDATBlock(nf, nf, n_samples=9, n_groups=4,
                                      n_heads=4, mlp_ratio=self.mlp_ratio,
                                      pred_res_flow=False, dtype=self.dtype)
        self.generator = BasicResPixelShuffleGenerator(
            nf, self.dec_res_blocks, dtype=self.dtype)

    def __call__(self, x0, x1, t, train: bool = False):
        nf = self.nf
        x0n, x1n, mean = norm_w_rgb_mean(x0, x1)
        if self.dtype is not None:
            x0n = x0n.astype(self.dtype)
            x1n = x1n.astype(self.dtype)

        f0 = self.cnn_encoder(x0n)
        f1 = self.cnn_encoder(x1n)

        feat_t_4, ft0_4, ft1_4 = self.dcn_feat_t_builder(f0[3], f1[3], t)
        up3 = self.query_builder3(
            jnp.concatenate([feat_t_4, ft0_4, ft1_4], axis=-1))
        feat_t_3 = up3[..., :nf]
        ft0_3, ft1_3 = up3[..., nf:nf + 2], up3[..., nf + 2:nf + 4]

        att3, ft0_2, ft1_2 = self.dat_scale3(feat_t_3, f0[2], f1[2],
                                             ft0_3, ft1_3)
        q2 = self.query_builder2(att3)
        att2, ft0_1, ft1_1 = self.dat_scale2(q2, f0[1], f1[1], ft0_2, ft1_2)
        q1 = self.query_builder1(att2)
        att1 = self.dat_scale1(q1, f0[0], f1[0], ft0_1, ft1_1)

        pred = self.generator(att1, mean).astype(jnp.float32)
        if not train:
            return pred
        return pred, {
            "feat_t_3": feat_t_3, "feat_t_4": feat_t_4,
            "flows0": [ft0_1, ft0_2, ft0_3, ft0_4],
            "flows1": [ft1_1, ft1_2, ft1_3, ft1_4],
            "mean": mean,
        }

    def encode(self, x):
        return self.cnn_encoder(x)


def dcndat_loss(model, params, pred, inter, batch,
                geo_lambda=0.01, distill_lambda=0.01):
    """``DCNDAT.py:274-303``: census + geometry (levels 3-4) + properly
    unit-scaled robust flow distillation."""
    xt = batch["xt"]
    ft0_gt, ft1_gt = batch["f0x"], batch["f1x"]

    l1 = charbonnier_l1(pred - xt)
    census = ternary_loss(pred, xt)
    total = l1 + census
    log = {"l1_loss": l1, "census_loss": census}

    if geo_lambda is not None:
        gt_feats = model.apply(params, xt - inter["mean"],
                               method=DCNDAT.encode)
        geo = geo_lambda * (
            geometry_loss(inter["feat_t_3"].astype(jnp.float32),
                          gt_feats[2].astype(jnp.float32))
            + geometry_loss(inter["feat_t_4"].astype(jnp.float32),
                            gt_feats[3].astype(jnp.float32))
        )
        total = total + geo
        log["geometry_loss"] = geo

    if distill_lambda is not None:
        def up(f, s):
            B, H, W, C = f.shape
            return resize_bilinear(f.astype(jnp.float32), (H * s, W * s),
                                   align_corners=True) * float(s)

        f0 = inter["flows0"]
        f1 = inter["flows1"]
        p0_full = up(f0[0], 2)
        p1_full = up(f1[0], 2)
        w0 = get_robust_weight(p0_full, ft0_gt, beta=0.3)
        w1 = get_robust_weight(p1_full, ft1_gt, beta=0.3)
        distill = distill_lambda * (
            charbonnier_ada(up(f0[1], 4) - ft0_gt, w0)
            + charbonnier_ada(up(f1[1], 4) - ft1_gt, w1)
            + charbonnier_ada(up(f0[2], 8) - ft0_gt, w0)
            + charbonnier_ada(up(f1[2], 8) - ft1_gt, w1)
            + charbonnier_ada(up(f0[3], 16) - ft0_gt, w0)
            + charbonnier_ada(up(f1[3], 16) - ft1_gt, w1)
        )
        total = total + distill
        log["flow_loss"] = distill

    log["total_loss"] = total
    return total, log
