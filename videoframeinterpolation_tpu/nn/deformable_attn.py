"""Deformable cross-attention block — the flagship model's core op.

Re-design of ``CrossDeformableAttentionBlockwFlow`` + ``Attn`` (reference
``modules/deformable_attn.py``): for each query pixel of the intermediate
frame, sample ``n_samples`` deformable locations per offset group from each
source frame (flow-seeded, tanh-bounded residual offsets) and attend over the
``2 * n_samples`` sampled values.

TPU notes:
  * The attention itself is tiny einsums over an ``S``-sized axis (S <= 64) —
    pure MXU work once the samples are gathered; the gather is the hot part
    and shares the :func:`...ops.interp.grid_sample` primitive.
  * Sampling coordinates are kept in *pixel* units end to end. The reference
    normalizes x by ``(W-1)*2`` but y by ``(H-1)/2`` when building its
    grid (``modules/deformable_attn.py:94-95``) — a scale asymmetry we do
    not reproduce; offsets here mean pixels in both axes.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops import bwarp, grid_sample, scale_resize
from .blocks import (
    ConvPReLU,
    FeedForward,
    HalfChannelConv5ResBlock,
    PReLU,
    conv,
    conv_transpose_x2,
    torch_conv_init,
    zero_init,
)

Array = jax.Array


class SampleAttention(nn.Module):
    """Per-pixel attention over S sampled key/values (``Attn``,
    ``modules/deformable_attn.py:10-40``).

    Query: ``(B, H, W, C)``; key/value: ``(B, S, H*W, C)``.
    """

    out_features: int
    n_samples: int  # total S (both frames concatenated)
    n_heads: int
    dtype: Any = None

    @nn.compact
    def __call__(self, q: Array, kv: Array) -> Array:
        B, H, W, C = q.shape
        nh = self.n_heads
        hc = self.out_features // nh
        scale = hc ** -0.5

        qp = nn.Dense(self.out_features, kernel_init=torch_conv_init,
                      dtype=self.dtype, name="q_proj")(q)
        kp = nn.Dense(self.out_features, kernel_init=torch_conv_init,
                      dtype=self.dtype, name="k_proj")(kv)
        vp = nn.Dense(self.out_features, kernel_init=torch_conv_init,
                      dtype=self.dtype, name="v_proj")(kv)

        qp = qp.reshape(B, H * W, nh, hc)
        kp = kp.reshape(B, self.n_samples, H * W, nh, hc)
        vp = vp.reshape(B, self.n_samples, H * W, nh, hc)

        # Keep the sample axis minor for the softmax (TPU lane-friendly).
        attn = jnp.einsum(
            "bnhc,bsnhc->bnhs", qp, kp, preferred_element_type=jnp.float32
        ) * scale
        attn = jax.nn.softmax(attn, axis=-1).astype(vp.dtype)
        out = jnp.einsum(
            "bnhs,bsnhc->bnhc", attn, vp, preferred_element_type=jnp.float32
        )
        return out.reshape(B, H, W, self.out_features).astype(q.dtype)


def _grouped_deformable_sample(
    feat: Array, ref_offsets: Array, n_groups: int, stride: int = 1
) -> Array:
    """Sample grouped features at per-group deformable locations.

    Args:
      feat: ``(B, H, W, C)`` source-frame features; channels split into
        ``n_groups`` groups.
      ref_offsets: ``(B, h, w, G, S, 2)`` pixel displacements ``(dx, dy)``
        relative to each query position, with ``(h, w) = (H, W) // stride``.
      stride: query-grid stride over the source map. With ``stride > 1``
        queries sit at the *centers* of each ``stride x stride`` cell
        (``j*stride + (stride-1)/2``) but still sample the full-resolution
        feature map — gather rows drop by ``stride**2``.

    Returns:
      ``(B, S, h*w, C)`` sampled key/value tensor (zeros out of bounds,
      matching ``F.grid_sample`` defaults at ``modules/deformable_attn.py:99``).
    """
    B, H, W, C = feat.shape
    G = n_groups
    h, w = ref_offsets.shape[1:3]
    S = ref_offsets.shape[4]
    Cg = C // G

    half = (stride - 1) / 2.0
    gy, gx = jnp.meshgrid(
        jnp.arange(h, dtype=jnp.float32) * stride + half,
        jnp.arange(w, dtype=jnp.float32) * stride + half,
        indexing="ij",
    )
    base = jnp.stack([gx, gy], axis=-1)  # (h, w, 2)
    coords = base[None, :, :, None, None, :] + ref_offsets.astype(jnp.float32)

    feat_g = feat.reshape(B, H, W, G, Cg).transpose(0, 3, 1, 2, 4).reshape(
        B * G, H, W, Cg
    )
    coords_g = coords.transpose(0, 3, 4, 1, 2, 5).reshape(B * G, S, h, w, 2)
    samples = grid_sample(feat_g, coords_g, padding_mode="zeros")
    # (B*G, S, h, w, Cg) -> (B, S, h*w, G*Cg)
    samples = samples.reshape(B, G, S, h, w, Cg).transpose(0, 2, 3, 4, 1, 5)
    return samples.reshape(B, S, h * w, C)


class CrossDeformableAttentionBlock(nn.Module):
    """Deformable cross-attention over both source frames, with optional
    next-level flow prediction (``CrossDeformableAttentionBlockwFlow``,
    ``modules/deformable_attn.py:43-124``)."""

    features: int
    out_features: int
    n_samples: int = 9
    n_groups: int = 12
    n_heads: int = 12
    mlp_ratio: float = 2.0
    offset_scale: float = 2.0
    pred_res_flow: bool = True
    # Exact-parity fast path: resolve all G·S samples from one K x K window
    # fetch per query instead of per-tap gathers (see ops/windowed.py).
    # Pure implementation switch — identical function and parameter tree,
    # so checkpoints transfer across the flag.
    window_sampling: bool = False
    # TPU-fast architecture variant (NOT checkpoint-compatible with the
    # reference): one learned offset set shared by every channel group, so
    # the sampler gathers S rows per query instead of G*S. Attention heads
    # are unchanged. Quality measured head-to-head in BENCH_NOTES.md.
    shared_offsets: bool = False
    # TPU-fast architecture variant #2 (trains from scratch): run the whole
    # block (movement extractor, offsets, sampling, attention, MLP) on a
    # stride x stride subsampled query grid — queries sit at cell centers
    # and still sample the FULL-resolution source features — then return to
    # full resolution through a learned transposed conv plus a zero-init
    # 3x3 "detail" conv on the full-res query. Cuts every per-query cost
    # (gather rows, convs, attention FLOPs) by stride**2 at the level.
    attn_stride: int = 1
    # TPU-fast architecture variant #3 (trains from scratch): width of the
    # movement-feature extractor (conv1 doubles it, reference parity is
    # ``features``). The movement convs are pure per-query compute — after
    # the sample-count ladder they are the largest lv1 cost slice
    # (tools/perf/README.md) — and the offset/flow heads read whatever
    # width comes out, so thinning is a local change. Quality study in
    # BENCH_NOTES.md.
    movement_nf: int | None = None
    # Reference-exact sampling units: emulate the reference's asymmetric
    # normalization (modules/deformable_attn.py:94-95 divides x by (W-1)*2
    # instead of (W-1)/2), i.e. effective x displacement = value/4 pixels.
    # Only for evaluating imported reference checkpoints
    # (interop.torch_weights); new training uses symmetric pixel units.
    ref_offset_units: bool = False
    dtype: Any = None

    def setup(self):
        c = self.features
        mc = self.movement_nf or c
        self.movement_conv1 = ConvPReLU(mc * 2, dtype=self.dtype)
        self.movement_conv2 = ConvPReLU(mc, dtype=self.dtype)
        self.movement_res = HalfChannelConv5ResBlock(mc, mc // 2, dtype=self.dtype)
        self.n_offset_sets = 1 if self.shared_offsets else self.n_groups
        self.conv_res_offset = conv(
            self.n_offset_sets * self.n_samples * 2,
            kernel_init=zero_init, bias_init=zero_init, dtype=self.dtype,
            name="conv_res_offset",
        )
        if self.pred_res_flow:
            self.conv_res_flow = conv_transpose_x2(2, dtype=self.dtype)
        self.attn = SampleAttention(
            self.out_features, self.n_samples * 2, self.n_heads,
            dtype=self.dtype,
        )
        self.mlp = FeedForward(
            int(self.out_features * self.mlp_ratio), self.out_features,
            dtype=self.dtype,
        )
        if self.attn_stride not in (1, 2):
            raise ValueError(f"attn_stride must be 1 or 2, got {self.attn_stride}")
        if self.attn_stride > 1:
            if self.pred_res_flow:
                raise ValueError("attn_stride > 1 requires pred_res_flow=False")
            if self.window_sampling:
                raise ValueError("attn_stride > 1 is incompatible with "
                                 "window_sampling")
            self.attn_upsample = conv_transpose_x2(
                self.out_features, dtype=self.dtype
            )
            self.conv_detail = conv(
                self.out_features, kernel_init=zero_init, bias_init=zero_init,
                dtype=self.dtype, name="conv_detail",
            )

    def _movement_feats(self, feat_t: Array, feat_x: Array, ftx: Array) -> Array:
        feat_t_from_x = bwarp(feat_x, ftx)
        h = jnp.concatenate([feat_t, feat_t_from_x, ftx], axis=-1)
        h = self.movement_conv1(h)
        h = self.movement_conv2(h)
        return self.movement_res(h)

    def _res_offsets(self, movement_feat: Array) -> Array:
        B, H, W, _ = movement_feat.shape
        res = self.offset_scale * jnp.tanh(self.conv_res_offset(movement_feat))
        return res.reshape(B, H, W, self.n_offset_sets, self.n_samples, 2)

    def _ref_offsets(self, ftx: Array, movement_feat: Array) -> Array:
        return self._res_offsets(movement_feat) + ftx[:, :, :, None, None, :]

    def __call__(
        self, feat_t: Array, feat0: Array, feat1: Array, ft0: Array, ft1: Array
    ):
        # Both source frames ride the batch axis through the (shared-weight)
        # movement extractor, offset predictor and sampler: one conv/gather
        # call at 2B instead of two at B — better MXU utilization at small
        # batch and half the per-op overhead.
        B = feat_t.shape[0]
        feat_b = jnp.concatenate([feat0, feat1], axis=0)
        ft_b = jnp.concatenate([ft0, ft1], axis=0)
        feat_t_b = jnp.concatenate([feat_t, feat_t], axis=0)

        if self.attn_stride > 1:
            return self._strided_forward(feat_t, feat_t_b, feat_b, ft_b)

        mv_b = self._movement_feats(feat_t_b, feat_b, ft_b)
        res_b = self._res_offsets(mv_b)
        if self.window_sampling:
            if self.ref_offset_units:
                raise ValueError(
                    "ref_offset_units is not supported with window_sampling"
                )
            from ..ops.windowed import windowed_deformable_sample

            kv_b = windowed_deformable_sample(
                feat_b, ft_b, res_b, self.n_offset_sets, self.offset_scale
            )
        else:
            off_b = res_b + ft_b[:, :, :, None, None, :]
            if self.ref_offset_units:
                off_b = off_b * jnp.asarray([0.25, 1.0], off_b.dtype)
            kv_b = _grouped_deformable_sample(feat_b, off_b, self.n_offset_sets)
        attended = self.attn(
            feat_t, jnp.concatenate([kv_b[:B], kv_b[B:]], axis=1)
        )
        out = attended + self.mlp(attended)

        if not self.pred_res_flow:
            return out

        # Next-level flows: transposed-conv residual on top of 2x-upsampled,
        # 2x-magnified current flow (modules/deformable_attn.py:118-123).
        up_b = self.conv_res_flow(mv_b) + 2.0 * scale_resize(ft_b, 2.0)
        return out, up_b[:B], up_b[B:]

    def _strided_forward(
        self, feat_t: Array, feat_t_b: Array, feat_b: Array, ft_b: Array
    ) -> Array:
        """Query-strided block body (``attn_stride > 1``).

        Everything per-query — movement convs, offset prediction, sampling,
        attention, MLP — runs on the pooled ``(H/s, W/s)`` grid; only the
        sampled source features stay at full resolution. Flow values stay in
        the level's pixel units throughout (the pooled bwarp divides by the
        stride because its target grid is coarse).
        """
        s = self.attn_stride
        B, H, W = feat_t.shape[:3]
        if H % s or W % s:
            raise ValueError(
                f"attn_stride={s} requires level dims divisible by it; got "
                f"{H}x{W} (avg_pool would floor odd dims and the detail-conv "
                "residual add would fail with a shape error)"
            )
        pool = lambda a: nn.avg_pool(a, (s, s), strides=(s, s))

        feat_b_c = pool(feat_b)
        ft_b_c = pool(ft_b)
        feat_t_b_c = pool(feat_t_b)

        warped = bwarp(feat_b_c, ft_b_c / float(s))
        h = jnp.concatenate([feat_t_b_c, warped, ft_b_c], axis=-1)
        h = self.movement_conv1(h)
        h = self.movement_conv2(h)
        mv_b = self.movement_res(h)

        off_b = self._res_offsets(mv_b) + ft_b_c[:, :, :, None, None, :]
        kv_b = _grouped_deformable_sample(
            feat_b, off_b, self.n_offset_sets, stride=s
        )
        attended = self.attn(
            feat_t_b_c[:B], jnp.concatenate([kv_b[:B], kv_b[B:]], axis=1)
        )
        out_c = attended + self.mlp(attended)
        return self.attn_upsample(out_c) + self.conv_detail(feat_t)
