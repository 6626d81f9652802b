"""DAT-TPU: the flagship pipeline with gather-free local-window attention.

Same coarse-to-fine skeleton, query builder, flow pyramid and losses as
``models/dat.py``, with each ``CrossDeformableAttentionBlock`` replaced by
``LocalWindowCrossAttentionBlock`` (see ``nn/local_attn.py`` for the
rationale). This is the TPU-native flagship *candidate*: it trades the
reference's sparse learned offsets for dense flow-aligned windows, removing
the per-row gather bottleneck entirely. It must be trained from scratch
(different architecture); its losses and training recipe are identical to
the flagship's so the same config trains it (``model_name:
DATwConstantnCTPU``).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..nn import (
    BasicResPixelShuffleGenerator,
    DCNInterFeatBuilderWithT,
    SameChannelResEncoder,
    conv_transpose_x2,
)
from ..nn.local_attn import LocalWindowCrossAttentionBlock
from ..ops import scale_resize
from .base import norm_w_rgb_mean
from .dat import dat_loss  # same loss

Array = jax.Array


class DATwConstantnCTPU(nn.Module):
    nf: int = 72
    enc_res_blocks: int = 5
    dec_res_blocks: int = 10
    mlp_ratio: float = 2.0
    # Window radii per level (lv3, lv2, lv1): dense (2r+1)^2 coverage
    # replacing the reference's nS=8/16/32 sparse samples with bound 2/4/8.
    radii: tuple = (2, 2, 3)
    # Optional dilated per-axis tap offsets per level (lv3, lv2, lv1),
    # overriding radii: dense near the flow-aligned center, sparse farther
    # out — wider reach than contiguous windows at the same (param-free)
    # cost. The round-2 quality study uses
    # ((-2,-1,0,1,2), (-4,-2,-1,0,1,2,4), (-6,-4,-2,-1,0,1,2,4,6)).
    offset_sets: tuple | None = None
    # Per-level learned per-group offsets (lv3, lv2, lv1); 0 disables.
    # Offset scales mirror the reference's 2/4/8 tanh bounds.
    n_offset_groups: tuple = (0, 0, 0)
    dtype: Any = None

    def setup(self):
        nf = self.nf
        r3, r2, r1 = self.radii
        o3, o2, o1 = (self.offset_sets if self.offset_sets is not None
                      else (None, None, None))
        g3, g2, g1 = self.n_offset_groups
        self.feature_encoder = SameChannelResEncoder(
            nf, self.enc_res_blocks, dtype=self.dtype)
        self.coarse_query_builder = DCNInterFeatBuilderWithT(nf,
                                                             dtype=self.dtype)
        self.lv4_to_lv3 = conv_transpose_x2(nf + 4, dtype=self.dtype)
        self.dat_lv3 = LocalWindowCrossAttentionBlock(
            nf, nf, radius=r3, n_heads=4, mlp_ratio=self.mlp_ratio,
            offsets_1d=o3, n_offset_groups=g3, offset_scale=2.0,
            dtype=self.dtype)
        self.lv3_to_lv2 = conv_transpose_x2(nf, dtype=self.dtype)
        self.dat_lv2 = LocalWindowCrossAttentionBlock(
            nf, nf, radius=r2, n_heads=8, mlp_ratio=self.mlp_ratio,
            offsets_1d=o2, n_offset_groups=g2, offset_scale=4.0,
            dtype=self.dtype)
        self.lv2_to_lv1 = conv_transpose_x2(nf, dtype=self.dtype)
        self.dat_lv1 = LocalWindowCrossAttentionBlock(
            nf, nf, radius=r1, n_heads=8, mlp_ratio=self.mlp_ratio,
            pred_res_flow=False, offsets_1d=o1, n_offset_groups=g1,
            offset_scale=8.0, dtype=self.dtype)
        self.pixel_generator = BasicResPixelShuffleGenerator(
            nf, self.dec_res_blocks, dtype=self.dtype)

    def __call__(self, x0: Array, x1: Array, t: Array, train: bool = False):
        nf = self.nf
        x0n, x1n, mean = norm_w_rgb_mean(x0, x1)
        if self.dtype is not None:
            x0n = x0n.astype(self.dtype)
            x1n = x1n.astype(self.dtype)

        feats = self.feature_encoder(jnp.concatenate([x0n, x1n], axis=0))
        B = x0.shape[0]
        (f0_1, f1_1), (f0_2, f1_2), (f0_3, f1_3), (f0_4, f1_4) = (
            (f[:B], f[B:]) for f in feats
        )

        feat_t_4, ft0_4, ft1_4 = self.coarse_query_builder(f0_4, f1_4, t)

        up3 = self.lv4_to_lv3(
            jnp.concatenate([feat_t_4, ft0_4, ft1_4], axis=-1))
        feat_t_3 = up3[..., :nf]
        ft0_3, ft1_3 = up3[..., nf:nf + 2], up3[..., nf + 2:nf + 4]

        att3, ft0_2, ft1_2 = self.dat_lv3(feat_t_3, f0_3, f1_3, ft0_3, ft1_3)
        q2 = self.lv3_to_lv2(att3)
        att2, ft0_1, ft1_1 = self.dat_lv2(q2, f0_2, f1_2, ft0_2, ft1_2)
        q1 = self.lv2_to_lv1(att2)
        att1 = self.dat_lv1(q1, f0_1, f1_1, ft0_1, ft1_1)

        pred = self.pixel_generator(att1, mean).astype(jnp.float32)
        if not train:
            return pred
        return pred, {
            "pred_ft0": [
                scale_resize(ft0_1, 2.0), scale_resize(ft0_2, 4.0),
                scale_resize(ft0_3, 8.0), scale_resize(ft0_4, 16.0),
            ],
            "pred_ft1": [
                scale_resize(ft1_1, 2.0), scale_resize(ft1_2, 4.0),
                scale_resize(ft1_3, 8.0), scale_resize(ft1_4, 16.0),
            ],
        }


dat_tpu_loss = dat_loss
