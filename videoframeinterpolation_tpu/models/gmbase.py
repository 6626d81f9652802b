"""GMFlow-base refinement family (reference archive ``LAMAResidual.py``,
``FFCRAFT.py``, ``RAFTRefine.py``, ``GMVFIFormer.py``).

All four archive files subclass a ``GMBase`` that was deleted from the tree
(broken imports on ``models.BaseModel.GMBase``, ``modules.matching``,
``modules.geometry``, ``modules.refine`` — SURVEY.md section 2.5). This
module reconstructs the family from the call sites:

  * ``GMBaseCore``: GMFlow backbone + transformer + global correlation
    flows, self-attention flow refinement, RAFT-style convex mask
    upsampling, dual-softmax certainty, occlusion-aware splat blending.
  * ``LAMAResidual``: blended base frame + LaMa FFC generator residual.
  * ``FFCRAFT``: blended base frame + iterative ConvGRU refinement over an
    FFC texture context (``LAMAUpdateBlock`` reconstructed).
  * ``GMVFIFormer`` (V1 semantics): flow-reversal-warped features decoded by
    a pixel-shuffle head into a blend mask + residual.

Standard public formulas are used for the missing geometry utilities
(forward-backward consistency, out-of-boundary masks).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..nn.blocks import ConvPReLU, conv
from ..nn.gm_encoder import GMCNNEncoder
from ..nn.ffc import FFCResNetGenerator, FFCTexture
from ..nn.transformer import (
    FeatureTransformer,
    SelfAttnPropagation,
    feature_add_position,
    global_correlation_softmax,
)
from ..ops import (
    bwarp,
    charbonnier_ada,
    charbonnier_l1,
    fwarp,
    pixel_shuffle,
    resize_bilinear,
    softsplat,
    ternary_loss,
)
from .m2m import denormalize_imgnet_to01, normalize_imgnet

Array = jax.Array


def convex_upsample(flow: Array, mask: Array, factor: int = 8) -> Array:
    """RAFT convex combination upsampling.

    Args:
      flow: ``(B, H, W, C)`` coarse field.
      mask: ``(B, H, W, 9 * factor**2)`` logits.

    Returns:
      ``(B, H*factor, W*factor, C)`` (values NOT magnitude-scaled).
    """
    B, H, W, C = flow.shape
    f = factor
    m = mask.reshape(B, H, W, 9, f * f)
    m = jax.nn.softmax(m, axis=3)

    # 3x3 neighborhoods of the coarse flow.
    fp = jnp.pad(flow, ((0, 0), (1, 1), (1, 1), (0, 0)))
    neigh = jnp.stack(
        [fp[:, dy:dy + H, dx:dx + W] for dy in range(3) for dx in range(3)],
        axis=3,
    )  # (B, H, W, 9, C)
    up = jnp.einsum("bhwkf,bhwkc->bhwfc", m.astype(flow.dtype), neigh)
    up = up.reshape(B, H, W, f, f, C)
    return up.transpose(0, 1, 3, 2, 4, 5).reshape(B, H * f, W * f, C)


def forward_backward_consistency_check(
    f01: Array, f10: Array, alpha: float = 0.01, beta: float = 0.5
) -> tuple[Array, Array]:
    """Occlusion masks from flow cycle inconsistency (standard formulation;
    reconstructs the missing ``modules.geometry`` helper)."""
    f10_w = bwarp(f10, f01)
    f01_w = bwarp(f01, f10)
    diff_fwd = jnp.sum((f01 + f10_w) ** 2, -1, keepdims=True)
    diff_bwd = jnp.sum((f10 + f01_w) ** 2, -1, keepdims=True)
    bound_fwd = alpha * (
        jnp.sum(f01 ** 2, -1, keepdims=True)
        + jnp.sum(f10_w ** 2, -1, keepdims=True)
    ) + beta
    bound_bwd = alpha * (
        jnp.sum(f10 ** 2, -1, keepdims=True)
        + jnp.sum(f01_w ** 2, -1, keepdims=True)
    ) + beta
    return (
        (diff_fwd > bound_fwd).astype(f01.dtype),
        (diff_bwd > bound_bwd).astype(f01.dtype),
    )


def compute_out_of_boundary_mask(flow: Array) -> Array:
    """1 where ``p + flow`` stays inside the frame."""
    B, H, W, _ = flow.shape
    gy, gx = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                          jnp.arange(W, dtype=jnp.float32), indexing="ij")
    tx = gx[None] + flow[..., 0].astype(jnp.float32)
    ty = gy[None] + flow[..., 1].astype(jnp.float32)
    ok = (tx >= 0) & (tx <= W - 1) & (ty >= 0) & (ty <= H - 1)
    return ok[..., None].astype(flow.dtype)


class GMBaseCore(nn.Module):
    """Shared GMFlow base: features, flows, certainties, convex upsampling."""

    nf: int = 128
    num_transformer_layers: int = 6
    upsample_factor: int = 8
    dtype: Any = None

    def setup(self):
        self.backbone = GMCNNEncoder(output_dim=self.nf, dtype=self.dtype)
        self.transformer = FeatureTransformer(
            self.num_transformer_layers, self.nf, dtype=self.dtype)
        self.feature_flow_attn = SelfAttnPropagation(self.nf,
                                                     dtype=self.dtype)
        self.upsampler_a = ConvPReLU(self.nf * 2, dtype=self.dtype)
        self.upsampler_b = conv(9 * self.upsample_factor ** 2,
                                dtype=self.dtype)
        self.alpha = self.param(
            "alpha", lambda k: 10.0 * jnp.ones((1, 1, 1, 1), jnp.float32))

    def features(self, x0n: Array, x1n: Array):
        both = jnp.concatenate([x0n, x1n], axis=0)
        feats = self.backbone(both)
        f0, f1 = jnp.split(feats, 2, axis=0)
        a0, a1 = feature_add_position(f0, f1, 2, self.nf)
        a0, a1 = self.transformer(a0, a1, num_splits=2)
        return f0, f1, a0, a1

    def flows_and_certainty(self, a0: Array, a1: Array):
        f01, f10, dual_prob = global_correlation_softmax(a0, a1)
        B, H, W, _ = a0.shape
        dual_prob = jax.lax.stop_gradient(dual_prob)
        c0 = jnp.max(dual_prob, -1).reshape(B, H, W, 1).astype(a0.dtype)
        c1 = jnp.max(dual_prob, -2).reshape(B, H, W, 1).astype(a0.dtype)
        # Self-attention refinement on detached flows (LAMAResidual.py:33-36).
        feats = jnp.concatenate([a0, a1], axis=0)
        flows = jnp.concatenate([f01, f10], axis=0)
        refined = self.feature_flow_attn(feats, jax.lax.stop_gradient(flows))
        f01r, f10r = jnp.split(refined, 2, axis=0)
        return f01r, f10r, c0, c1

    def upsample_mask(self, flow: Array, feat: Array) -> Array:
        h = self.upsampler_a(jnp.concatenate([flow, feat], axis=-1))
        return self.upsampler_b(h)

    def base_frame(self, x0n, x1n, f01, f10, c0, c1, a0, a1, t):
        """Occlusion-aware splat blend at full resolution
        (LAMAResidual.py:52-73)."""
        uf = self.upsample_factor
        mask0 = self.upsample_mask(f01, a0)
        mask1 = self.upsample_mask(f10, a1)
        f01_up = convex_upsample(f01, mask0, uf) * uf
        f10_up = convex_upsample(f10, mask1, uf) * uf
        c0_up = jax.lax.stop_gradient(convex_upsample(c0, mask0, uf))
        c1_up = jax.lax.stop_gradient(convex_upsample(c1, mask1, uf))

        alpha = self.alpha.astype(x0n.dtype)
        z0 = c0_up * alpha
        z1 = c1_up * alpha

        xt_from_x0 = fwarp(x0n, f01_up * t, z0)
        xt_from_x1 = fwarp(x1n, f10_up * (1.0 - t), z1)
        zt_from_z0 = fwarp(c0_up, f01_up * t, z0)
        zt_from_z1 = fwarp(c1_up, f10_up * (1.0 - t), z1)

        occ_f, occ_b = forward_backward_consistency_check(f01, f10)
        occ_f_up = convex_upsample(occ_f, mask0, uf)
        occ_b_up = convex_upsample(occ_b, mask1, uf)
        occ_f_t = fwarp(occ_f_up, f01_up * t, z0)
        occ_b_t = fwarp(occ_b_up, f10_up * (1.0 - t), z1)

        m0 = zt_from_z0 * (1.0 - zt_from_z1) * (1.0 - occ_b_t) + 1e-6
        m1 = zt_from_z1 * (1.0 - zt_from_z0) * (1.0 - occ_f_t) + 1e-6
        blended = (xt_from_x0 * m0 + xt_from_x1 * m1) / (m0 + m1)
        return blended, f01_up, f10_up


def _gm_loss(pred, base, batch, f01_up, f10_up, distill_lambda=0.01):
    xt = batch["xt"]
    l1 = charbonnier_l1(pred - xt) + charbonnier_l1(jnp.clip(base, 0, 1) - xt)
    census = ternary_loss(pred, xt) + ternary_loss(jnp.clip(base, 0, 1), xt)
    w = jnp.ones_like(f01_up[..., :1])
    distill = distill_lambda * (
        charbonnier_ada(f01_up.astype(jnp.float32) - batch["f0x"], w)
        + charbonnier_ada(f10_up.astype(jnp.float32) - batch["f1x"], w)
    )
    total = l1 + census + distill
    return total, {"total_loss": total, "l1_loss": l1,
                   "census_loss": census, "flow_loss": distill}


class LAMAResidual(nn.Module):
    """GM base frame + FFC generator residual (``LAMAResidual.py``)."""

    nf: int = 128
    num_transformer_layers: int = 6
    ngf: int = 64
    n_blocks: int = 6
    dtype: Any = None

    def setup(self):
        self.core = GMBaseCore(self.nf, self.num_transformer_layers,
                               dtype=self.dtype)
        self.generator = FFCResNetGenerator(
            output_nc=3, ngf=self.ngf, n_blocks=self.n_blocks,
            dtype=self.dtype)

    def __call__(self, x0, x1, t, train: bool = False):
        x0n = normalize_imgnet(x0)
        x1n = normalize_imgnet(x1)
        if self.dtype is not None:
            x0n = x0n.astype(self.dtype)
            x1n = x1n.astype(self.dtype)
        tt = t.astype(x0n.dtype)

        f0, f1, a0, a1 = self.core.features(x0n, x1n)
        f01, f10, c0, c1 = self.core.flows_and_certainty(a0, a1)
        blended, f01_up, f10_up = self.core.base_frame(
            x0n, x1n, f01, f10, c0, c1, a0, a1, tt)

        gen_in = jnp.concatenate(
            [x0n, jax.lax.stop_gradient(blended), x1n], axis=-1)
        residual = self.generator(gen_in)
        pred = jnp.clip(
            denormalize_imgnet_to01(blended + residual).astype(jnp.float32),
            0, 1)
        if not train:
            return pred
        base01 = denormalize_imgnet_to01(blended).astype(jnp.float32)
        return pred, {"base": base01, "f01_up": f01_up, "f10_up": f10_up}


class ConvGRU(nn.Module):
    """Convolutional GRU cell (reconstructs ``modules.refine``)."""

    hidden: int
    dtype: Any = None

    @nn.compact
    def __call__(self, h: Array, x: Array) -> Array:
        hx = jnp.concatenate([h, x], axis=-1)
        z = jax.nn.sigmoid(conv(self.hidden, dtype=self.dtype, name="convz")(hx))
        r = jax.nn.sigmoid(conv(self.hidden, dtype=self.dtype, name="convr")(hx))
        q = jnp.tanh(conv(self.hidden, dtype=self.dtype, name="convq")(
            jnp.concatenate([r * h, x], axis=-1)))
        return (1.0 - z) * h + z * q


class LAMAUpdateBlock(nn.Module):
    """ConvGRU update producing a full-resolution RGB residual via a
    pixel-shuffle head (reconstructs ``modules.refine.LAMAUpdateBlock``,
    ``FFCRAFT.py:7,17``). Operates at 1/8 resolution."""

    hidden: int = 128
    dtype: Any = None

    @nn.compact
    def __call__(self, net: Array, inp: Array, cur_feat: Array):
        enc = ConvPReLU(self.hidden, dtype=self.dtype, name="enc")(
            jnp.concatenate([inp, cur_feat], axis=-1))
        net = ConvGRU(self.hidden, dtype=self.dtype, name="gru")(net, enc)
        h = ConvPReLU(self.hidden, dtype=self.dtype, name="head1")(net)
        h = conv(3 * 64, dtype=self.dtype, name="head2")(h)
        residual = pixel_shuffle(pixel_shuffle(pixel_shuffle(h, 2), 2), 2)
        return net, residual


class FFCRAFT(nn.Module):
    """GM base frame + iterative ConvGRU refinement over an FFC texture
    context (``FFCRAFT.py``)."""

    nf: int = 128
    num_transformer_layers: int = 6
    refine_iters: int = 3
    make_residual: bool = True
    dtype: Any = None

    def setup(self):
        self.core = GMBaseCore(self.nf, self.num_transformer_layers,
                               dtype=self.dtype)
        self.cnet = FFCTexture(nfeats=(64, 128, 256, 256), n_blocks=4,
                               dtype=self.dtype)
        self.refiner = LAMAUpdateBlock(128, dtype=self.dtype)

    def __call__(self, x0, x1, t, train: bool = False):
        x0n = normalize_imgnet(x0)
        x1n = normalize_imgnet(x1)
        if self.dtype is not None:
            x0n = x0n.astype(self.dtype)
            x1n = x1n.astype(self.dtype)
        tt = t.astype(x0n.dtype)

        f0, f1, a0, a1 = self.core.features(x0n, x1n)
        f01, f10, c0, c1 = self.core.flows_and_certainty(a0, a1)
        blended_n, f01_up, f10_up = self.core.base_frame(
            x0n, x1n, f01, f10, c0, c1, a0, a1, tt)
        base = jnp.clip(denormalize_imgnet_to01(blended_n), 0, 1)

        cfeat = self.cnet(jnp.concatenate([x0, x1], axis=-1).astype(
            base.dtype))
        net, inp = jnp.split(cfeat, 2, axis=-1)
        net = jnp.tanh(net)
        inp = nn.relu(inp)

        blended = jax.lax.stop_gradient(base)
        preds = [base]
        for _ in range(self.refine_iters):
            blended = jax.lax.stop_gradient(blended)
            cur_feat = self.cnet(
                jnp.concatenate([blended, blended], axis=-1))
            net, residual = self.refiner(net, inp, cur_feat)
            if self.make_residual:
                blended = jnp.clip(blended + jnp.tanh(residual), 0, 1)
            else:
                blended = jax.nn.sigmoid(residual)
            preds.append(blended)

        pred = blended.astype(jnp.float32)
        if not train:
            return pred
        return pred, {"base": base.astype(jnp.float32),
                      "f01_up": f01_up, "f10_up": f10_up}


class GMVFIFormer(nn.Module):
    """``GMVFIFormerV1`` (``GMVFIFormer.py:175-304``): flow-reversal-warped
    features -> pixel-shuffle decoder -> mask + residual blend."""

    nf: int = 128
    num_transformer_layers: int = 6
    dtype: Any = None

    def setup(self):
        self.core = GMBaseCore(self.nf, self.num_transformer_layers,
                               dtype=self.dtype)
        nf = self.nf
        self.dec1 = conv(nf * 4, dtype=self.dtype)
        self.dec2 = conv(nf * 4, dtype=self.dtype)
        self.dec3 = conv(nf * 4, dtype=self.dtype)
        self.dec4 = conv(nf // 2, dtype=self.dtype)
        self.dec5 = conv(4, dtype=self.dtype)

    def _decode(self, x):
        x = pixel_shuffle(self.dec1(x), 2)
        x = pixel_shuffle(self.dec2(x), 2)
        x = pixel_shuffle(self.dec3(x), 2)
        x = nn.leaky_relu(self.dec4(x), 0.2)
        return self.dec5(x)

    def __call__(self, x0, x1, t, train: bool = False):
        x0n = normalize_imgnet(x0)
        x1n = normalize_imgnet(x1)
        if self.dtype is not None:
            x0n = x0n.astype(self.dtype)
            x1n = x1n.astype(self.dtype)
        tt = t.astype(x0n.dtype)

        f0, f1, a0, a1 = self.core.features(x0n, x1n)
        f01, f10, c0, c1 = self.core.flows_and_certainty(a0, a1)
        alpha = self.core.alpha.astype(a0.dtype)
        z0 = c0 * alpha
        z1 = c1 * alpha

        # Flow reversal (GMVFIFormer.py:254-259).
        ft0 = -fwarp(f01, f01 * tt, z0) * tt
        ft1 = -fwarp(f10, f10 * (1.0 - tt), z1) * (1.0 - tt)
        feat_t_from_0 = bwarp(f0, ft0)
        feat_t_from_1 = bwarp(f1, ft1)

        dec_in = jnp.concatenate(
            [jax.lax.stop_gradient(a0), feat_t_from_0,
             feat_t_from_1, jax.lax.stop_gradient(a1)], axis=-1)
        decoded = self._decode(dec_in)
        res = jnp.tanh(decoded[..., :3])
        mask = jax.nn.sigmoid(decoded[..., 3:4])

        def up8(v):
            B, H, W, C = v.shape
            return resize_bilinear(v, (H * 8, W * 8), align_corners=True)

        f01_up = up8(f01) * 8.0
        f10_up = up8(f10) * 8.0
        z0_up = up8(z0)
        z1_up = up8(z1)
        xt_w0 = fwarp(x0, f01_up * tt, z0_up)
        xt_w1 = fwarp(x1, f10_up * (1.0 - tt), z1_up)
        merged = xt_w0 * mask + xt_w1 * (1.0 - mask)
        pred = jnp.clip((merged + res).astype(jnp.float32), 0, 1)
        if not train:
            return pred
        return pred, {"base": merged.astype(jnp.float32),
                      "f01_up": f01_up, "f10_up": f10_up}


def gmbase_loss(pred, inter, batch) -> tuple[Array, dict]:
    return _gm_loss(pred, inter["base"], batch,
                    inter["f01_up"], inter["f10_up"])


class GRUFeatUpdate(nn.Module):
    """ConvGRU update over *features* (reconstructs the missing
    ``modules.refine.GRUforFeat``, reference ``RAFTRefine.py:9,253``):
    returns the new hidden state and a feature residual."""

    hidden: int = 128
    dtype: Any = None

    @nn.compact
    def __call__(self, net: Array, inp: Array, cur_feat: Array):
        enc = ConvPReLU(self.hidden, dtype=self.dtype, name="enc")(
            jnp.concatenate([inp, cur_feat], axis=-1))
        net = ConvGRU(self.hidden, dtype=self.dtype, name="gru")(net, enc)
        res = conv(self.hidden, dtype=self.dtype, name="head")(net)
        return net, res


class RAFTRefine(nn.Module):
    """GM base + RAFT-style iterative feature refinement (reference
    ``models/archive/RAFTRefine.py:164-270``, a non-runnable sketch with
    every import missing — reconstructed from its call sites).

    Distinct from :class:`LAMAResidual` / :class:`FFCRAFT`:

      * intermediate-frame flows by flow reversal at 1/8 resolution
        (``small_ft0 = -fwarp(f01, f01*t, z0) * t``, ``RAFTRefine.py:182``),
        zeroed outside the frame by out-of-boundary masks (``:183-188``);
      * ``feat_t`` built by backward-warping the *pre-transformer* encoder
        features with those flows (``:244-245``);
      * a ConvGRU refines ``feat_t`` itself for ``refine_iters`` steps, each
        iterate decoded to RGB through a sigmoid pixel-shuffle head and
        supervised with gamma-weighted sequence losses (``:253-259``,
        ``calcul_losses`` ``:140-161``);
      * the occlusion-aware blended base frame is prediction #0 (``:241``).
    """

    nf: int = 128
    num_transformer_layers: int = 6
    refine_iters: int = 3
    hidden: int = 128
    dtype: Any = None

    def setup(self):
        self.core = GMBaseCore(self.nf, self.num_transformer_layers,
                               dtype=self.dtype)
        self.inp_proj = conv(2 * self.hidden, dtype=self.dtype)
        self.feat_proj = conv(self.hidden, dtype=self.dtype)
        self.refiner = GRUFeatUpdate(self.hidden, dtype=self.dtype)
        self.up_head1 = ConvPReLU(self.hidden, dtype=self.dtype)
        self.up_head2 = conv(3 * 64, dtype=self.dtype)

    def _decode(self, feat_t: Array) -> Array:
        """1/8-res features -> full-res RGB in [0, 1] (``UpConvHead`` +
        sigmoid, RAFTRefine.py:258)."""
        h = self.up_head2(self.up_head1(feat_t))
        h = pixel_shuffle(pixel_shuffle(pixel_shuffle(h, 2), 2), 2)
        return jax.nn.sigmoid(h)

    def __call__(self, x0, x1, t, train: bool = False):
        x0n = normalize_imgnet(x0)
        x1n = normalize_imgnet(x1)
        if self.dtype is not None:
            x0n = x0n.astype(self.dtype)
            x1n = x1n.astype(self.dtype)
        tt = t.astype(x0n.dtype)

        f0, f1, a0, a1 = self.core.features(x0n, x1n)
        f01, f10, c0, c1 = self.core.flows_and_certainty(a0, a1)
        blended, f01_up, f10_up = self.core.base_frame(
            x0n, x1n, f01, f10, c0, c1, a0, a1, tt)
        base = jnp.clip(denormalize_imgnet_to01(blended), 0, 1)

        # Flow reversal at 1/8: splat f01 toward t and negate
        # (RAFTRefine.py:182-188), out-of-boundary contributions zeroed.
        alpha = self.core.alpha.astype(x0n.dtype)
        z0 = c0 * alpha
        z1 = c1 * alpha
        small_ft0 = -fwarp(f01, f01 * tt, z0) * tt
        small_ft0 = small_ft0 * compute_out_of_boundary_mask(small_ft0)
        small_ft1 = -fwarp(f10, f10 * (1.0 - tt), z1) * (1.0 - tt)
        small_ft1 = small_ft1 * compute_out_of_boundary_mask(small_ft1)

        # feat_t from the ORIGINAL (pre-transformer) encoder features
        # (RAFTRefine.py:244-245).
        ft_from_0 = bwarp(f0, small_ft0)
        ft_from_1 = bwarp(f1, small_ft1)
        both = jnp.concatenate([ft_from_0, ft_from_1], axis=-1)

        net, inp = jnp.split(self.inp_proj(both), 2, axis=-1)
        net = jnp.tanh(net)
        inp = nn.relu(inp)
        feat_t = self.feat_proj(both)

        preds = [base.astype(jnp.float32)]
        for _ in range(self.refine_iters):
            feat_t = jax.lax.stop_gradient(feat_t)
            net, res_feat = self.refiner(net, inp, feat_t)
            feat_t = feat_t + res_feat
            preds.append(self._decode(feat_t).astype(jnp.float32))

        pred = preds[-1]
        if not train:
            return pred
        return pred, {"preds": preds, "base": preds[0],
                      "f01_up": f01_up, "f10_up": f10_up}


def raftrefine_loss(pred, inter, batch, gamma: float = 0.8,
                    distill_lambda: float = 0.01) -> tuple[Array, dict]:
    """Gamma-weighted sequence loss over all refinement iterates
    (``RAFTRefine.py:140-161``) plus the GM flow-distillation term the
    family shares."""
    del pred
    xt = batch["xt"]
    preds = inter["preds"]
    n = len(preds)
    l1 = 0.0
    census = 0.0
    for i, p in enumerate(preds):
        w = gamma ** (n - i - 1)
        l1 = l1 + w * charbonnier_l1(p - xt)
        census = census + w * ternary_loss(p, xt)
    total = l1 + census
    log = {"l1_loss": l1, "census_loss": census}
    if "f0x" in batch:
        w = jnp.ones_like(inter["f01_up"][..., :1], jnp.float32)
        distill = distill_lambda * (
            charbonnier_ada(inter["f01_up"].astype(jnp.float32)
                            - batch["f0x"], w)
            + charbonnier_ada(inter["f10_up"].astype(jnp.float32)
                              - batch["f1x"], w)
        )
        total = total + distill
        log["flow_loss"] = distill
    log["total_loss"] = total
    return total, log
