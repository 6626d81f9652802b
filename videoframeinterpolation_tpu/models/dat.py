"""Flagship model: coarse-to-fine deformable-attention interpolator.

Re-design of ``DATwConstantnCv1`` (reference ``models/DAT.py``):

  1/16  shared 4-level encoder on both frames (constant ``nf`` channels)
        -> t-conditioned DCN query builder gives (feat_t, ft0, ft1)
  1/8   ConvTranspose joint upsample of [feat || ft0 || ft1]
        -> deformable attention level 3 (nS=8,  nG=4, nH=4, scale 2)
  1/4   -> deformable attention level 2 (nS=16, nG=8, nH=8, scale 4)
  1/2   -> deformable attention level 1 (nS=32, nG=8, nH=8, scale 8, no flow)
  1/1   PixelShuffle generator -> clamp(rgb + mean, 0, 1)

Training loss (``models/DAT.py:132-153``): Charbonnier L1 + ternary census on
the prediction, plus robust-weighted flow distillation of levels 2-4 against
the pseudo-GT flows, with robust weights computed from the level-1 flow.
The reference's unit quirks are preserved exactly (flows are spatially
upsampled to full resolution *without* magnitude rescaling,
``models/DAT.py:96-105``, and the data pipeline feeds pseudo-GT flows scaled
by 1/255, ``data/Vimeo90K.py:100``) so loss values are comparable.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..nn import (
    BasicResPixelShuffleGenerator,
    CrossDeformableAttentionBlock,
    DCNInterFeatBuilderWithT,
    SameChannelResEncoder,
    conv_transpose_x2,
)
from ..ops import (
    charbonnier_ada,
    charbonnier_l1,
    get_robust_weight,
    scale_resize,
    ternary_loss,
)
from .base import norm_w_rgb_mean

Array = jax.Array


class DATwConstantnC(nn.Module):
    """DATwConstantnCv1 re-designed for NHWC / XLA."""

    nf: int = 72
    enc_res_blocks: int = 5
    dec_res_blocks: int = 10
    mlp_ratio: float = 2.0
    # Exact-parity windowed sampling (ops/windowed.py): same math and the
    # same parameter tree, ~13x fewer gather rows at the finest level.
    window_sampling: bool = False
    # TPU-fast variant (trains from scratch, NOT reference-checkpoint
    # compatible): a DAT level with shared offsets learns ONE offset set
    # shared by all its channel groups, cutting its sampler gather rows by
    # n_groups (8x at lv1). Everything else — attention heads, losses,
    # pyramid — is unchanged. True shares every level; a (lv3, lv2, lv1)
    # triple selects per level (quality study in BENCH_NOTES.md).
    shared_offsets: bool | tuple = False
    # Deformable samples per level (lv3, lv2, lv1). The reference hardcodes
    # (8, 16, 32) (models/DAT.py:24-26); sampler gather rows scale linearly
    # with the lv1 count, so (8, 16, 16) halves the hot level's rows —
    # quality study in BENCH_NOTES.md. Non-default counts train from
    # scratch (offset-conv + attention K/V widths change).
    n_samples: tuple = (8, 16, 32)
    # Query-grid stride per level (lv3, lv2, lv1). A strided level runs its
    # whole DAT block on an (H/s, W/s) query grid (sampling the full-res
    # source features) and returns through a learned upsample + zero-init
    # detail conv — s**2 fewer gather rows AND convs/attention FLOPs at
    # that level. Only supported where pred_res_flow=False (lv1). Trains
    # from scratch; quality study in BENCH_NOTES.md.
    attn_strides: tuple = (1, 1, 1)
    # Movement-extractor width per level (lv3, lv2, lv1); None = reference
    # parity (= nf per level). The movement convs are the largest lv1 cost
    # slice after the sample ladder (tools/perf/README.md); thinning them
    # trains from scratch — quality study in BENCH_NOTES.md.
    movement_nf: tuple | None = None
    # Emulate the reference sampler's asymmetric x/4 offset units so
    # imported reference checkpoints (interop.torch_weights) compute the
    # identical function; see nn/deformable_attn.py and REBUILD_NOTES.md.
    ref_offset_units: bool = False
    dtype: Any = None

    def setup(self):
        nf = self.nf
        ws = self.window_sampling
        so = self.shared_offsets
        so3, so2, so1 = (so, so, so) if isinstance(so, bool) else tuple(so)
        ns3, ns2, ns1 = self.n_samples
        st3, st2, st1 = self.attn_strides
        mv3, mv2, mv1 = self.movement_nf or (None, None, None)
        if st3 != 1 or st2 != 1:
            raise ValueError(
                "attn_strides: only the finest level (lv1) may be strided — "
                "lv3/lv2 predict next-level flows (pred_res_flow)")
        self.feature_encoder = SameChannelResEncoder(
            nf, self.enc_res_blocks, dtype=self.dtype
        )
        self.coarse_query_builder = DCNInterFeatBuilderWithT(nf, dtype=self.dtype)
        self.lv4_to_lv3 = conv_transpose_x2(nf + 4, dtype=self.dtype)
        self.dat_lv3 = CrossDeformableAttentionBlock(
            nf, nf, n_samples=ns3, n_groups=4, n_heads=4,
            offset_scale=2.0, mlp_ratio=self.mlp_ratio,
            window_sampling=ws, shared_offsets=so3, movement_nf=mv3,
            ref_offset_units=self.ref_offset_units, dtype=self.dtype,
        )
        self.lv3_to_lv2 = conv_transpose_x2(nf, dtype=self.dtype)
        self.dat_lv2 = CrossDeformableAttentionBlock(
            nf, nf, n_samples=ns2, n_groups=8, n_heads=8,
            offset_scale=4.0, mlp_ratio=self.mlp_ratio,
            window_sampling=ws, shared_offsets=so2, movement_nf=mv2,
            ref_offset_units=self.ref_offset_units, dtype=self.dtype,
        )
        self.lv2_to_lv1 = conv_transpose_x2(nf, dtype=self.dtype)
        self.dat_lv1 = CrossDeformableAttentionBlock(
            nf, nf, n_samples=ns1, n_groups=8, n_heads=8,
            offset_scale=8.0, mlp_ratio=self.mlp_ratio,
            pred_res_flow=False, window_sampling=ws, shared_offsets=so1,
            attn_stride=st1, movement_nf=mv1,
            ref_offset_units=self.ref_offset_units, dtype=self.dtype,
        )
        self.pixel_generator = BasicResPixelShuffleGenerator(
            nf, self.dec_res_blocks, dtype=self.dtype
        )

    def encode(self, x0: Array, x1: Array):
        """The t-invariant stage: normalization + shared-weight feature
        pyramid on both frames batched together (2B).

        Returned ``(feats, mean)`` feed :meth:`decode`; for factor-N
        sequence upsampling the encoder runs ONCE per pair while decode
        runs per interpolation instant (``interpolate.py --mode direct``).
        """
        x0n, x1n, mean = norm_w_rgb_mean(x0, x1)
        if self.dtype is not None:
            x0n = x0n.astype(self.dtype)
            x1n = x1n.astype(self.dtype)
        feats = self.feature_encoder(jnp.concatenate([x0n, x1n], axis=0))
        return feats, mean

    def __call__(
        self, x0: Array, x1: Array, t: Array, train: bool = False
    ):
        """Generate the intermediate frame.

        Args:
          x0, x1: ``(B, H, W, 3)`` in [0, 1]; H, W divisible by 16.
          t: ``(B, 1, 1, 1)`` interpolation instant.
          train: if True also return intermediate flow pyramids for the loss.
        """
        feats, mean = self.encode(x0, x1)
        return self.decode(feats, mean, t, train=train)

    def decode(self, feats, mean, t: Array, train: bool = False):
        """The t-dependent stage: query building, deformable cross-attention
        pyramid, and the pixel generator."""
        nf = self.nf
        B = feats[0].shape[0] // 2
        (f0_1, f1_1), (f0_2, f1_2), (f0_3, f1_3), (f0_4, f1_4) = (
            (f[:B], f[B:]) for f in feats
        )

        feat_t_4, ft0_4, ft1_4 = self.coarse_query_builder(f0_4, f1_4, t)

        up3 = self.lv4_to_lv3(
            jnp.concatenate([feat_t_4, ft0_4, ft1_4], axis=-1)
        )
        feat_t_3 = up3[..., :nf]
        ft0_3, ft1_3 = up3[..., nf:nf + 2], up3[..., nf + 2:nf + 4]

        attended_3, ft0_2, ft1_2 = self.dat_lv3(feat_t_3, f0_3, f1_3, ft0_3, ft1_3)

        query_2 = self.lv3_to_lv2(attended_3)
        attended_2, ft0_1, ft1_1 = self.dat_lv2(query_2, f0_2, f1_2, ft0_2, ft1_2)

        query_1 = self.lv2_to_lv1(attended_2)
        attended_1 = self.dat_lv1(query_1, f0_1, f1_1, ft0_1, ft1_1)

        img_pred = self.pixel_generator(attended_1, mean)
        img_pred = img_pred.astype(jnp.float32)

        if not train:
            return img_pred

        # Flow pyramids upsampled to full resolution for distillation
        # (spatial only — magnitudes stay in their level's pixel units,
        # models/DAT.py:96-105).
        intermediates = {
            "pred_ft0": [
                scale_resize(ft0_1, 2.0), scale_resize(ft0_2, 4.0),
                scale_resize(ft0_3, 8.0), scale_resize(ft0_4, 16.0),
            ],
            "pred_ft1": [
                scale_resize(ft1_1, 2.0), scale_resize(ft1_2, 4.0),
                scale_resize(ft1_3, 8.0), scale_resize(ft1_4, 16.0),
            ],
        }
        return img_pred, intermediates


def dat_loss(
    img_pred: Array,
    intermediates: dict,
    batch: dict,
    distill_lambda: float | None = 0.01,
) -> tuple[Array, dict]:
    """Training loss of the flagship model (``models/DAT.py:132-153``)."""
    xt = batch["xt"]
    l1 = charbonnier_l1(img_pred - xt)
    census = ternary_loss(img_pred, xt)
    total = l1 + census
    log = {"l1_loss": l1, "census_loss": census}

    if distill_lambda is not None and "f0x" in batch:
        ft0, ft1 = batch["f0x"], batch["f1x"]
        p0 = [f.astype(jnp.float32) for f in intermediates["pred_ft0"]]
        p1 = [f.astype(jnp.float32) for f in intermediates["pred_ft1"]]
        w0 = get_robust_weight(p0[0], ft0, beta=0.3)
        w1 = get_robust_weight(p1[0], ft1, beta=0.3)
        distill = (
            charbonnier_ada(p0[1] - ft0, w0) + charbonnier_ada(p1[1] - ft1, w1)
            + charbonnier_ada(p0[2] - ft0, w0) + charbonnier_ada(p1[2] - ft1, w1)
            + charbonnier_ada(p0[3] - ft0, w0) + charbonnier_ada(p1[3] - ft1, w1)
        )
        distill = distill_lambda * distill
        total = total + distill
        log["flow_loss"] = distill

    log["total_loss"] = total
    return total, log
