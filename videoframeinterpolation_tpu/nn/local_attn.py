"""Flow-aligned local-window cross-attention — the TPU-native re-design of
the deformable attention block.

The reference's deformable attention gathers ``G*S`` sparse samples per
query (``modules/deformable_attn.py``), which on TPU is bound by per-row
gather cost (~8-13 ns/row; see tools/perf/README.md) — 14.6M rows per
frame-pair at the finest level. This block removes gathers entirely:

  1. backward-warp the source features by the current flow (ONE dense
     H*W-row gather — 0.2% of the sparse row count);
  2. build a dense K x K window of the warped features with static shifts
     (pure slices — no gathers);
  3. cross-attend each query over the 2 * K^2 window positions of both
     frames (einsums on the MXU, identical head structure to the
     reference's ``Attn``).

Capacity-wise this replaces "G groups x S learned offsets around the flow"
with "all K^2 integer offsets around the flow, shared across heads" —
denser coverage of a slightly smaller radius. It is a DIFFERENT model (must
be trained from scratch; it cannot load reference-architecture weights),
registered as the ``DATwConstantnCTPU`` flagship variant.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops import bwarp, scale_resize
from .blocks import (
    ConvPReLU,
    FeedForward,
    HalfChannelConv5ResBlock,
    conv_transpose_x2,
)
from .deformable_attn import SampleAttention

Array = jax.Array


def extract_local_windows(x: Array, radius: int) -> Array:
    """(B, H, W, C) -> (B, K*K, H*W, C) dense window views, zero padded.

    Pure static slices — XLA lowers these to copies, no gathers.
    """
    B, H, W, C = x.shape
    K = 2 * radius + 1
    xp = jnp.pad(x, ((0, 0), (radius, radius), (radius, radius), (0, 0)))
    views = [
        xp[:, dy:dy + H, dx:dx + W]
        for dy in range(K) for dx in range(K)
    ]
    return jnp.stack(views, axis=1).reshape(B, K * K, H * W, C)


class LocalWindowCrossAttentionBlock(nn.Module):
    """Drop-in structural analog of ``CrossDeformableAttentionBlock``:
    same (feat_t, feat0, feat1, ft0, ft1) interface, same flow head."""

    features: int
    out_features: int
    radius: int = 3
    n_heads: int = 8
    mlp_ratio: float = 2.0
    pred_res_flow: bool = True
    dtype: Any = None

    def setup(self):
        c = self.features
        K = 2 * self.radius + 1
        self.movement_conv1 = ConvPReLU(c * 2, dtype=self.dtype)
        self.movement_conv2 = ConvPReLU(c, dtype=self.dtype)
        self.movement_res = HalfChannelConv5ResBlock(c, c // 2,
                                                     dtype=self.dtype)
        if self.pred_res_flow:
            self.conv_res_flow = conv_transpose_x2(2, dtype=self.dtype)
        self.attn = SampleAttention(self.out_features, 2 * K * K,
                                    self.n_heads, dtype=self.dtype)
        self.mlp = FeedForward(int(self.out_features * self.mlp_ratio),
                               self.out_features, dtype=self.dtype)

    def __call__(self, feat_t, feat0, feat1, ft0, ft1):
        B = feat_t.shape[0]
        feat_b = jnp.concatenate([feat0, feat1], axis=0)
        ft_b = jnp.concatenate([ft0, ft1], axis=0)
        feat_t_b = jnp.concatenate([feat_t, feat_t], axis=0)

        # Flow-align both frames (the block's only gather), then movement
        # features exactly like the reference block.
        warped_b = bwarp(feat_b, ft_b)
        h = jnp.concatenate([feat_t_b, warped_b, ft_b], axis=-1)
        mv_b = self.movement_res(self.movement_conv2(self.movement_conv1(h)))

        kv_b = extract_local_windows(warped_b, self.radius)  # (2B, K2, N, C)
        kv = jnp.concatenate([kv_b[:B], kv_b[B:]], axis=1)   # (B, 2K2, N, C)

        attended = self.attn(feat_t, kv)
        out = attended + self.mlp(attended)

        if not self.pred_res_flow:
            return out
        up_b = self.conv_res_flow(mv_b) + 2.0 * scale_resize(ft_b, 2.0)
        return out, up_b[:B], up_b[B:]
