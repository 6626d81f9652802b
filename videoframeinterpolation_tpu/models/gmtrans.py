"""GMTrans: GMFlow matching + certainty-metric splatting + Swin decoding
(reference ``models/archive/GMTrans.py:317-433``).

Pipeline: conv pyramid (48/96/128) -> feature transformer at 1/8 -> global
correlation softmax flows + dual-softmax certainty -> softmax-splat features
to time t -> ConvTranspose + two Swin cross-attention decoder stacks ->
PixelShuffle residual on top of a full-resolution splatted base frame.

Reference quirks fixed (documented):
  * ``GMTrans.py:409`` applies ImageNet denormalization to mean-normalized
    data (leftover from a commented-out path, :369); we add the mean back
    only, matching the model's own normalization and its loss path (:417).
  * inputs are [0, 1] (the archive divides by 255 again, :370).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..nn.blocks import ConvPReLU, PReLU, conv, conv_transpose_x2
from ..nn.swin import SwinDecoder
from ..nn.transformer import (
    FeatureTransformer,
    feature_add_position,
    global_correlation_softmax,
)
from ..ops import (
    charbonnier_l1,
    fwarp_using_two_frames,
    pixel_shuffle,
    resize_bilinear,
    ternary_loss,
)

Array = jax.Array


def _resize(x: Array, scale: float) -> Array:
    B, H, W, C = x.shape
    return resize_bilinear(x, (int(H * scale), int(W * scale)),
                           align_corners=True)


class GMTrans(nn.Module):
    nf: int = 128
    pyramid: tuple = (48, 96, 128)
    num_transformer_layers: int = 6
    dtype: Any = None

    def setup(self):
        c1, c2, c3 = self.pyramid
        self.enc1a = ConvPReLU(c1, stride=2, dtype=self.dtype)
        self.enc1b = ConvPReLU(c1, stride=1, dtype=self.dtype)
        self.enc2a = ConvPReLU(c2, stride=2, dtype=self.dtype)
        self.enc2b = ConvPReLU(c2, stride=1, dtype=self.dtype)
        self.enc3a = ConvPReLU(c3, stride=2, dtype=self.dtype)
        self.enc3b = ConvPReLU(c3, stride=1, dtype=self.dtype)
        self.transformer = FeatureTransformer(
            self.num_transformer_layers, self.nf, dtype=self.dtype
        )
        self.decoder4 = conv_transpose_x2(c2, dtype=self.dtype)
        self.decoder3 = SwinDecoder(c2, depth=6, num_heads=6, window_size=4,
                                    mlp_ratio=2.0, upsample_to=c1,
                                    dtype=self.dtype)
        self.decoder2 = SwinDecoder(c1, depth=6, num_heads=6, window_size=4,
                                    mlp_ratio=4.0, dtype=self.dtype)
        self.decoder1 = conv(12, dtype=self.dtype)
        self.alpha = self.param(
            "alpha", lambda k: 10.0 * jnp.ones((1, 1, 1, 1), jnp.float32)
        )

    def _encode(self, x):
        f1 = self.enc1b(self.enc1a(x))
        f2 = self.enc2b(self.enc2a(f1))
        f3 = self.enc3b(self.enc3a(f2))
        return f1, f2, f3

    def __call__(self, x0, x1, t, train: bool = False):
        m0 = jnp.mean(x0, axis=(1, 2, 3), keepdims=True)
        m1 = jnp.mean(x1, axis=(1, 2, 3), keepdims=True)
        mean = 0.5 * (m0 + m1)
        x0n, x1n = x0 - mean, x1 - mean
        if self.dtype is not None:
            x0n = x0n.astype(self.dtype)
            x1n = x1n.astype(self.dtype)
        tt = t.astype(x0n.dtype)

        f0_1, f0_2, f0_3 = self._encode(x0n)
        f1_1, f1_2, f1_3 = self._encode(x1n)
        B, fh, fw, _ = f0_3.shape

        a0, a1 = feature_add_position(f0_3, f1_3, 2, self.nf)
        a0, a1 = self.transformer(a0, a1, num_splits=2)

        f01_4, f10_4, dual_prob = global_correlation_softmax(a0, a1)
        dual_prob = jax.lax.stop_gradient(dual_prob)
        alpha = self.alpha.astype(f01_4.dtype)
        z0_4 = (1.0 - jnp.max(dual_prob, -1).reshape(B, fh, fw, 1)
                ).astype(f01_4.dtype) * alpha
        z1_4 = (1.0 - jnp.max(dual_prob, -2).reshape(B, fh, fw, 1)
                ).astype(f01_4.dtype) * alpha

        feat_t_4, _ = fwarp_using_two_frames(
            f0_3, f01_4 * tt, tt, f1_3, f10_4 * (1.0 - tt), 1.0 - tt,
            z0_4, z1_4,
        )

        feat_t_3 = self.decoder4(feat_t_4)
        feat_t_2 = self.decoder3(feat_t_3, f0_2, f1_2)
        feat_t_1 = self.decoder2(feat_t_2, f0_1, f1_1)
        residual = pixel_shuffle(self.decoder1(feat_t_1), 2)

        pred_f01 = _resize(f01_4, 8.0) * 8.0
        pred_f10 = _resize(f10_4, 8.0) * 8.0
        z0 = _resize(z0_4, 8.0)
        z1 = _resize(z1_4, 8.0)
        base, _ = fwarp_using_two_frames(
            x0n, pred_f01 * tt, tt, x1n, pred_f10 * (1.0 - tt), 1.0 - tt,
            z0, z1,
        )
        pred = jnp.clip(
            (base + residual + mean.astype(base.dtype)).astype(jnp.float32),
            0, 1,
        )
        if not train:
            return pred
        return pred, {
            "base": (base + mean.astype(base.dtype)).astype(jnp.float32),
            "pred_f01": pred_f01.astype(jnp.float32),
            "pred_f10": pred_f10.astype(jnp.float32),
        }


def gmtrans_loss(pred, inter, batch) -> tuple[Array, dict]:
    """``GMTrans.py:414-422``: photometric losses on both the final frame
    and the splatted base, MSE flow distillation."""
    xt = batch["xt"]
    base = jnp.clip(inter["base"], 0, 1)
    l1 = charbonnier_l1(pred - xt) + charbonnier_l1(base - xt)
    census = ternary_loss(pred, xt) + ternary_loss(base, xt)
    distill = 0.01 * (
        jnp.mean((inter["pred_f01"] - batch["f0x"]) ** 2)
        + jnp.mean((inter["pred_f10"] - batch["f1x"]) ** 2)
    )
    total = l1 + census + distill
    return total, {
        "total_loss": total, "l1_loss": l1, "census_loss": census,
        "flow_loss": distill,
    }
