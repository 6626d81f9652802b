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


def _shift2d(x: Array, dy: int, dx: int, pad_val: Array) -> Array:
    """Shift a (B, H, W, C) map by (dy, dx) in window coordinates, filling
    exposed borders with ``pad_val`` (a (C,) vector)."""
    B, H, W, C = x.shape
    xs = x - pad_val
    r_y, r_x = abs(dy), abs(dx)
    xs = jnp.pad(xs, ((0, 0), (r_y, r_y), (r_x, r_x), (0, 0)))
    xs = xs[:, r_y + dy:r_y + dy + H, r_x + dx:r_x + dx + W]
    return xs + pad_val


class ShiftWindowSampleAttention(nn.Module):
    """Math-identical, memory-light form of ``SampleAttention`` over dense
    K x K windows.

    ``SampleAttention`` materializes the (B, 2K^2, H*W, C) window tensor and
    projects it (K^2 redundant projection FLOPs, ~0.8 GB of kv traffic at
    the finest level). Because the projections are pointwise-linear,
    ``k_proj(window(x)) == window(k_proj(x))`` — so this module projects the
    dense maps ONCE and slides shifted views instead. Out-of-window
    positions in the original are zero *inputs*, whose projection is the
    bias vector — shifted maps are therefore padded with the bias, keeping
    the math bit-comparable (same softmax over the same scores).

    Parameter tree matches ``SampleAttention`` (q_proj/k_proj/v_proj), so
    checkpoints transfer either way.
    """

    out_features: int
    radius: int
    n_heads: int
    # Optional explicit per-axis tap offsets (dilated windows): taps are
    # the cross product offsets_1d x offsets_1d. None = contiguous
    # [-radius, radius]. Dilated sets widen reach at the same cost — the
    # shifts stay static slices, and there are no extra parameters.
    offsets_1d: tuple | None = None
    dtype: Any = None

    @nn.compact
    def __call__(self, q: Array, warped0: Array, warped1: Array) -> Array:
        from .blocks import torch_conv_init

        B, H, W, C = q.shape
        nh = self.n_heads
        hc = self.out_features // nh
        scale = hc ** -0.5

        q_proj = nn.Dense(self.out_features, kernel_init=torch_conv_init,
                          dtype=self.dtype, name="q_proj")
        k_proj = nn.Dense(self.out_features, kernel_init=torch_conv_init,
                          dtype=self.dtype, name="k_proj")
        v_proj = nn.Dense(self.out_features, kernel_init=torch_conv_init,
                          dtype=self.dtype, name="v_proj")

        qp = q_proj(q).reshape(B, H, W, nh, hc)
        both = jnp.concatenate([warped0, warped1], axis=0)
        kp_b = k_proj(both)
        vp_b = v_proj(both)
        k_bias = k_proj.variables["params"]["bias"].astype(kp_b.dtype)
        v_bias = v_proj.variables["params"]["bias"].astype(vp_b.dtype)

        axis = (tuple(self.offsets_1d) if self.offsets_1d is not None
                else tuple(range(-self.radius, self.radius + 1)))
        shifts = [(dy, dx) for dy in axis for dx in axis]

        scores = []
        v_maps = []
        for frame in (0, 1):
            kp = kp_b[frame * B:(frame + 1) * B].reshape(B, H, W, nh, hc)
            vp = vp_b[frame * B:(frame + 1) * B]
            for (dy, dx) in shifts:
                ks = _shift2d(kp.reshape(B, H, W, nh * hc), dy, dx, k_bias
                              ).reshape(B, H, W, nh, hc)
                s = jnp.einsum("bhwnc,bhwnc->bhwn", qp, ks,
                               preferred_element_type=jnp.float32)
                scores.append(s)
                v_maps.append((vp, dy, dx))
        attn = jnp.stack(scores, axis=-1) * scale  # (B, H, W, nh, 2K^2)
        attn = jax.nn.softmax(attn, axis=-1)

        out = jnp.zeros((B, H, W, nh, hc), jnp.float32)
        for i, (vp, dy, dx) in enumerate(v_maps):
            vs = _shift2d(vp, dy, dx, v_bias).reshape(B, H, W, nh, hc)
            out = out + attn[..., i, None].astype(jnp.float32) * vs.astype(
                jnp.float32)
        return out.reshape(B, H, W, self.out_features).astype(q.dtype)


class LocalWindowCrossAttentionBlock(nn.Module):
    """Drop-in structural analog of ``CrossDeformableAttentionBlock``:
    same (feat_t, feat0, feat1, ft0, ft1) interface, same flow head."""

    features: int
    out_features: int
    radius: int = 3
    n_heads: int = 8
    mlp_ratio: float = 2.0
    pred_res_flow: bool = True
    offsets_1d: tuple | None = None  # dilated taps; None = [-radius, radius]
    # > 0: per-group learned continuous offsets (the reference's deformable
    # capacity at 1/S of its gather rows): each of n_offset_groups channel
    # groups is flow-aligned by its OWN tanh-bounded offset before the
    # static window — one bwarp per group instead of G*S sparse gathers.
    # Zero-init, so a checkpoint trained without offsets upgrades in place.
    n_offset_groups: int = 0
    offset_scale: float = 8.0
    dtype: Any = None

    def setup(self):
        c = self.features
        self.movement_conv1 = ConvPReLU(c * 2, dtype=self.dtype)
        self.movement_conv2 = ConvPReLU(c, dtype=self.dtype)
        self.movement_res = HalfChannelConv5ResBlock(c, c // 2,
                                                     dtype=self.dtype)
        if self.n_offset_groups:
            from .blocks import conv, zero_init

            self.conv_group_offset = conv(
                self.n_offset_groups * 2, kernel_init=zero_init,
                bias_init=zero_init, dtype=self.dtype,
                name="conv_group_offset")
        if self.pred_res_flow:
            self.conv_res_flow = conv_transpose_x2(2, dtype=self.dtype)
        # Shifted-map attention: same params and math as SampleAttention
        # over extract_local_windows, without materializing the
        # (B, 2K^2, N, C) window tensor (see ShiftWindowSampleAttention).
        self.attn = ShiftWindowSampleAttention(
            self.out_features, self.radius, self.n_heads,
            offsets_1d=self.offsets_1d, dtype=self.dtype)
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

        if self.n_offset_groups:
            # Re-align each channel group by its own learned residual
            # offset (G more dense bwarps — still 2*(1+G)*H*W gather rows
            # total vs the reference's 2*G*S*H*W).
            G = self.n_offset_groups
            B2, H, W, C = feat_b.shape
            Cg = C // G
            off = self.offset_scale * jnp.tanh(self.conv_group_offset(mv_b))
            off = off.reshape(B2, H, W, G, 2)
            flows_g = (ft_b[:, :, :, None, :] + off).transpose(0, 3, 1, 2, 4)
            feat_g = feat_b.reshape(B2, H, W, G, Cg).transpose(0, 3, 1, 2, 4)
            warped_g = bwarp(feat_g.reshape(B2 * G, H, W, Cg),
                             flows_g.reshape(B2 * G, H, W, 2))
            warped_b = warped_g.reshape(B2, G, H, W, Cg).transpose(
                0, 2, 3, 1, 4).reshape(B2, H, W, C)

        attended = self.attn(feat_t, warped_b[:B], warped_b[B:])
        out = attended + self.mlp(attended)

        if not self.pred_res_flow:
            return out
        up_b = self.conv_res_flow(mv_b) + 2.0 * scale_resize(ft_b, 2.0)
        return out, up_b[:B], up_b[B:]
