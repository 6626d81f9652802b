"""Motion-aware deformable attention modules (reference ``modules/madat.py``
and ``modules/corr.py``): EMA-VFI-style motion estimated from attention
scores via coordinate embeddings.

``InterFrameAttention``: bidirectional full cross-frame attention (both
directions folded into the batch axis) whose score matrix also transports a
coordinate embedding — motion = proj(attn @ cor_embed - cor_embed)
(``modules/corr.py:47-107``).

``DATWithMotionEstimation``: LayerNorm-ed deformable attention whose
per-sample softmax scores turn sampled coordinates into a motion feature
(``modules/madat.py:118-206``).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops import bwarp, grid_sample
from .blocks import ConvPReLU, PReLU, conv, zero_init, torch_conv_init
from .deformable_attn import _grouped_deformable_sample

Array = jax.Array

xavier_init = nn.initializers.xavier_uniform()


def _normalized_coords(h: int, w: int, dtype=jnp.float32) -> Array:
    """[-1, 1] coordinate grid as (1, H*W, 2) (x, y)."""
    gy, gx = jnp.meshgrid(
        jnp.linspace(-1.0, 1.0, h), jnp.linspace(-1.0, 1.0, w), indexing="ij"
    )
    return jnp.stack([gx, gy], -1).reshape(1, h * w, 2).astype(dtype)


class DWConvMlp(nn.Module):
    """Linear -> depthwise conv -> GELU -> Linear on (B, N, C) tokens
    (``modules/corr.py:28-44``)."""

    hidden: int
    out: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array, h: int, w: int) -> Array:
        B, N, C = x.shape
        x = nn.Dense(self.hidden, dtype=self.dtype, name="fc1")(x)
        xs = x.reshape(B, h, w, self.hidden)
        xs = nn.Conv(self.hidden, (3, 3), padding=((1, 1), (1, 1)),
                     feature_group_count=self.hidden, dtype=self.dtype,
                     name="dwconv")(xs)
        x = nn.gelu(xs.reshape(B, N, self.hidden), approximate=False)
        return nn.Dense(self.out, dtype=self.dtype, name="fc2")(x)


class InterFrameAttention(nn.Module):
    dim: int
    motion_dim: int = 64
    num_heads: int = 8
    mlp_ratio: float = 4.0
    dtype: Any = None

    @nn.compact
    def __call__(self, feat0: Array, feat1: Array) -> tuple[Array, Array]:
        B0, H, W, C = feat0.shape
        nh = self.num_heads
        hc = C // nh
        scale = hc ** -0.5

        # The reference applies the SAME norm to both frames (corr.py:74-76).
        norm1 = nn.LayerNorm(dtype=self.dtype, name="norm1")
        f0n = norm1(feat0.reshape(B0, H * W, C))
        f1n = norm1(feat1.reshape(B0, H * W, C))

        feat_s = jnp.concatenate([f0n, f1n], axis=0)  # (2B, N, C)
        feat_t = jnp.concatenate([f1n, f0n], axis=0)
        B, N, _ = feat_s.shape

        cor = jnp.broadcast_to(
            _normalized_coords(H, W, feat_s.dtype), (B, N, 2))

        q = nn.Dense(C, dtype=self.dtype, name="q_proj")(feat_s)
        kv = nn.Dense(2 * C, dtype=self.dtype, name="kv_proj")(feat_t)
        k, v = jnp.split(kv, 2, axis=-1)
        cor_embed_flat = nn.Dense(self.motion_dim, dtype=self.dtype,
                                  name="cor_embed")(cor)

        q = q.reshape(B, N, nh, hc).transpose(0, 2, 1, 3)
        k = k.reshape(B, N, nh, hc).transpose(0, 2, 1, 3)
        v = v.reshape(B, N, nh, hc).transpose(0, 2, 1, 3)
        mc = self.motion_dim // nh
        ce = cor_embed_flat.reshape(B, N, nh, mc).transpose(0, 2, 1, 3)

        attn = jnp.einsum("bhnc,bhmc->bhnm", q, k,
                          preferred_element_type=jnp.float32) * scale
        attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)

        x = jnp.einsum("bhnm,bhmc->bhnc", attn, v,
                       preferred_element_type=jnp.float32)
        x = x.transpose(0, 2, 1, 3).reshape(B, N, C).astype(feat_s.dtype)
        x = nn.Dense(C, dtype=self.dtype, name="proj")(x)
        feat_s = x + feat_s

        norm2 = nn.LayerNorm(dtype=self.dtype, name="norm2")
        out = feat_s + DWConvMlp(int(C * self.mlp_ratio), C,
                                 dtype=self.dtype, name="mlp")(
            norm2(feat_s), H, W)
        out = out.reshape(B, H, W, C)

        # Attention score -> motion via coordinate embedding transport.
        c_rev = jnp.einsum("bhnm,bhmc->bhnc", attn, ce,
                           preferred_element_type=jnp.float32)
        c_rev = c_rev.transpose(0, 2, 1, 3).reshape(B, N, self.motion_dim)
        motion = nn.Dense(self.motion_dim, dtype=self.dtype,
                          name="motion_proj")(
            c_rev.astype(feat_s.dtype) - cor_embed_flat)
        motion = motion.reshape(B, H, W, self.motion_dim)
        return out, motion


class FlowSelfAttnPropagation(nn.Module):
    """Flow + feature propagation by self-attention
    (``modules/madat.py:103-134``)."""

    in_channels: int
    dtype: Any = None

    @nn.compact
    def __call__(self, feat_t, flow0, flow1):
        B, H, W, C = feat_t.shape
        tokens = feat_t.reshape(B, H * W, C)
        q = nn.Dense(C, kernel_init=xavier_init, dtype=self.dtype,
                     name="q_proj")(tokens)
        k = nn.Dense(C, kernel_init=xavier_init, dtype=self.dtype,
                     name="k_proj")(q)
        scores = jnp.einsum("blc,bmc->blm", q, k,
                            preferred_element_type=jnp.float32) / (C ** 0.5)
        prob = jax.nn.softmax(scores, axis=-1).astype(feat_t.dtype)

        def prop(v):
            vv = v.reshape(B, H * W, -1)
            out = jnp.einsum("blm,bmv->blv", prob, vv,
                             preferred_element_type=jnp.float32)
            return out.reshape(B, H, W, -1).astype(v.dtype)

        value = nn.Dense(C, kernel_init=xavier_init, dtype=self.dtype,
                         name="v_proj")(q)
        return (prop(value.reshape(B, H, W, C)), prop(flow0), prop(flow1))


class SmallResBlock(nn.Module):
    """3-conv side-channel residual block (``modules/madat.py:46-67``)."""

    features: int
    side_features: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        c, s = self.features, self.side_features
        out = conv(c, dtype=self.dtype, name="conv1")(x)
        out = PReLU(c, name="prelu1")(out)
        main, side = out[..., : c - s], out[..., c - s:]
        side = conv(s, dtype=self.dtype, name="conv2")(side)
        side = PReLU(s, name="prelu2")(side)
        out = jnp.concatenate([main, side], axis=-1)
        return x + conv(c, dtype=self.dtype, name="conv3")(out)


class DATWithMotionEstimation(nn.Module):
    """Deformable attention + motion from sample scores
    (``modules/madat.py:118-206``). Requires n_groups == n_heads.

    ``motion_dim`` fixes the motion output width: the reference projects
    motion to ``out_c`` (``modules/madat.py:132``) yet feeds it into a
    shared ``motion2flow`` head built for 64 channels
    (``models/archive/MADAT.py:149-155,199,212``) — a crash with the
    shipped ``channels: [16, 32, 64]`` config. Reference bug fixed: motion
    is projected to a constant ``motion_dim`` at every level so one shared
    head serves the whole pyramid, which is plainly the design intent.
    """

    features: int
    out_features: int
    n_samples: int = 9
    n_groups: int = 4
    n_heads: int = 4
    mlp_ratio: float = 2.0
    offset_scale: float = 2.0
    motion_dim: int = 64
    dtype: Any = None

    def setup(self):
        assert self.n_groups == self.n_heads
        c = self.features
        self.conv_in = ConvPReLU(c, dtype=self.dtype)
        self.res = SmallResBlock(c, c // 2, dtype=self.dtype)
        self.conv_res_offset = conv(
            self.n_groups * self.n_samples * 2,
            kernel_init=zero_init, bias_init=zero_init, dtype=self.dtype,
            name="conv_res_offset",
        )
        self.norm1 = nn.LayerNorm(dtype=self.dtype)
        self.norm2 = nn.LayerNorm(dtype=self.dtype)
        self.q_proj = nn.Dense(self.out_features, dtype=self.dtype)
        self.k_proj = nn.Dense(self.out_features, dtype=self.dtype)
        self.v_proj = nn.Dense(self.out_features, dtype=self.dtype)
        self.coord_proj = nn.Dense(self.out_features, dtype=self.dtype)
        self.motion_proj = nn.Dense(self.motion_dim, dtype=self.dtype)
        self.mlp = DWConvMlp(int(self.out_features * self.mlp_ratio),
                             self.out_features, dtype=self.dtype)

    def _movement(self, feat_t, feat_x, ftx):
        h = jnp.concatenate([feat_t, bwarp(feat_x, ftx), ftx], axis=-1)
        return self.res(self.conv_in(h))

    def _ref_offsets(self, ftx, movement):
        B, H, W, _ = ftx.shape
        res = self.offset_scale * jnp.tanh(self.conv_res_offset(movement))
        res = res.reshape(B, H, W, self.n_groups, self.n_samples, 2)
        return res + ftx[:, :, :, None, None, :]

    def __call__(self, feat_t, feat0, feat1, ft0, ft1):
        B, H, W, C = feat_t.shape
        S = self.n_samples
        nh = self.n_heads
        hc = self.out_features // nh

        mv0 = self._movement(feat_t, feat0, ft0)
        off0 = self._ref_offsets(ft0, mv0)
        kv0 = _grouped_deformable_sample(self.norm1(feat0), off0,
                                         self.n_groups)
        mv1 = self._movement(feat_t, feat1, ft1)
        off1 = self._ref_offsets(ft1, mv1)
        kv1 = _grouped_deformable_sample(self.norm1(feat1), off1,
                                         self.n_groups)

        kv = jnp.concatenate([kv0, kv1], axis=1)  # (B, 2S, N, C)
        feat_tn = self.norm1(feat_t)

        q = self.q_proj(feat_tn.reshape(B, H * W, C)).reshape(
            B, H * W, nh, hc)
        k = self.k_proj(kv).reshape(B, 2 * S, H * W, nh, hc)
        v = self.v_proj(kv).reshape(B, 2 * S, H * W, nh, hc)

        attn = jnp.einsum("bnhc,bsnhc->bsnh", q, k,
                          preferred_element_type=jnp.float32) * (hc ** -0.5)
        score = jax.nn.softmax(attn, axis=1).astype(v.dtype)
        out = jnp.einsum("bsnh,bsnhc->bnhc", score, v,
                         preferred_element_type=jnp.float32)
        out = out.reshape(B, H * W, self.out_features).astype(feat_t.dtype)

        feat = feat_tn.reshape(B, H * W, C) + out
        feat = feat + self.mlp(self.norm2(feat), H, W)
        feat = feat.reshape(B, H, W, self.out_features)

        # Motion from scores: per-head (== per-group) softmaxed sample
        # scores transport projected sample coordinates
        # (modules/madat.py:195-205). Coordinates are normalized [-1, 1].
        score0 = jax.nn.softmax(attn[:, :S], axis=1)   # (B, S, N, nh)
        score1 = jax.nn.softmax(attn[:, S:], axis=1)

        def motion_from(off, score):
            # off: (B, H, W, G, S, 2) pixel displacements -> sampled
            # normalized coords.
            gy, gx = jnp.meshgrid(
                jnp.arange(H, dtype=jnp.float32),
                jnp.arange(W, dtype=jnp.float32), indexing="ij",
            )
            base = jnp.stack([gx, gy], -1)
            coords = base[None, :, :, None, None, :] + off.astype(jnp.float32)
            norm = jnp.asarray(
                [2.0 / max(W - 1, 1), 2.0 / max(H - 1, 1)], jnp.float32)
            coords = coords * norm - 1.0
            proj = self.coord_proj(coords.astype(feat_t.dtype))
            # (B, H, W, G, S, C') with scores (B, S, N, G)
            proj = proj.reshape(B, H * W, self.n_groups, S, -1)
            moved = jnp.einsum(
                "bsng,bngsc->bngc", score.astype(proj.dtype), proj,
                preferred_element_type=jnp.float32,
            ).astype(feat_t.dtype)  # (B, N, G, C')
            moved = jnp.mean(moved, axis=2)
            base_proj = self.coord_proj(
                jnp.broadcast_to(
                    _normalized_coords(H, W, feat_t.dtype), (B, H * W, 2))
            )
            return self.motion_proj(moved - base_proj).reshape(
                B, H, W, self.motion_dim)

        motion_t0 = motion_from(off0, score0)
        motion_t1 = motion_from(off1, score1)
        return feat, motion_t0, motion_t1
