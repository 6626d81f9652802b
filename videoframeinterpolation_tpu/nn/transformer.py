"""GMFlow-style feature transformer + global correlation matching.

Re-design of the reference's GMFlow re-implementation
(``models/archive/GMM2M.py:213-633``): Swin split-window single-head
attention, self+cross TransformerBlocks run bidirectionally by folding both
frame directions into the batch axis, softmax global correlation producing
bidirectional flow + dual-softmax certainty, and self-attention flow
propagation.

All of this is pure einsum/window-reshape work — exactly what XLA maps onto
the MXU with no custom kernels.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn
import numpy as np

from .position import position_embedding_sine

Array = jax.Array

xavier_init = nn.initializers.xavier_uniform()


def split_windows(x: Array, num_splits: int) -> Array:
    """(B, H, W, C) -> (B*K*K, H/K, W/K, C) (``GMM2M.py:413-434``)."""
    B, H, W, C = x.shape
    K = num_splits
    x = x.reshape(B, K, H // K, K, W // K, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(B * K * K, H // K, W // K, C)


def merge_windows(x: Array, num_splits: int) -> Array:
    """Inverse of :func:`split_windows` (``GMM2M.py:213-229``)."""
    BKK, h, w, C = x.shape
    K = num_splits
    B = BKK // (K * K)
    x = x.reshape(B, K, K, h, w, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(B, K * h, K * w, C)


def shifted_window_attn_mask(
    h: int, w: int, num_splits: int
) -> np.ndarray:
    """Swin SW-MSA mask, computed host-side once per shape
    (``GMM2M.py:437-461``). Returns ``(K*K, win, win)`` additive mask."""
    wsh, wsw = h // num_splits, w // num_splits
    ssh, ssw = wsh // 2, wsw // 2
    img_mask = np.zeros((1, h, w, 1), np.float32)
    cnt = 0
    for hs in (slice(0, -wsh), slice(-wsh, -ssh), slice(-ssh, None)):
        for ws in (slice(0, -wsw), slice(-wsw, -ssw), slice(-ssw, None)):
            img_mask[:, hs, ws, :] = cnt
            cnt += 1
    m = img_mask.reshape(1, num_splits, wsh, num_splits, wsw, 1)
    m = m.transpose(0, 1, 3, 2, 4, 5).reshape(-1, wsh * wsw)
    attn_mask = m[:, None, :] - m[:, :, None]
    return np.where(attn_mask != 0, -100.0, 0.0).astype(np.float32)


def full_attention(q: Array, k: Array, v: Array) -> Array:
    """Single-head full attention on (B, L, C) (``GMM2M.py:232-240``)."""
    c = q.shape[-1]
    scores = jnp.einsum(
        "blc,bmc->blm", q, k, preferred_element_type=jnp.float32
    ) / (c ** 0.5)
    attn = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    return jnp.einsum("blm,bmc->blc", attn, v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


def swin_window_attention(
    q: Array, k: Array, v: Array, h: int, w: int,
    num_splits: int, with_shift: bool, attn_mask: Array | None,
) -> Array:
    """Single-head split-window (optionally shifted) attention on (B, L, C)
    (``GMM2M.py:243-296``)."""
    B, L, C = q.shape
    assert L == h * w
    q = q.reshape(B, h, w, C)
    k = k.reshape(B, h, w, C)
    v = v.reshape(B, h, w, C)
    wsh, wsw = h // num_splits, w // num_splits

    if with_shift:
        shift = (-(wsh // 2), -(wsw // 2))
        q = jnp.roll(q, shift, axis=(1, 2))
        k = jnp.roll(k, shift, axis=(1, 2))
        v = jnp.roll(v, shift, axis=(1, 2))

    qs = split_windows(q, num_splits).reshape(-1, wsh * wsw, C)
    ks = split_windows(k, num_splits).reshape(-1, wsh * wsw, C)
    vs = split_windows(v, num_splits).reshape(-1, wsh * wsw, C)

    scores = jnp.einsum(
        "blc,bmc->blm", qs, ks, preferred_element_type=jnp.float32
    ) / (C ** 0.5)
    if with_shift:
        assert attn_mask is not None
        scores = scores + jnp.tile(attn_mask, (B, 1, 1))
    attn = jax.nn.softmax(scores, axis=-1).astype(vs.dtype)
    out = jnp.einsum("blm,bmc->blc", attn, vs,
                     preferred_element_type=jnp.float32).astype(q.dtype)

    out = merge_windows(out.reshape(-1, wsh, wsw, C), num_splits)
    if with_shift:
        out = jnp.roll(out, (wsh // 2, wsw // 2), axis=(1, 2))
    return out.reshape(B, L, C)


class TransformerLayer(nn.Module):
    """Single-head attention + optional concat-FFN (``GMM2M.py:299-366``)."""

    d_model: int
    no_ffn: bool = False
    ffn_dim_expansion: int = 4
    dtype: Any = None

    @nn.compact
    def __call__(self, source, target, *, h, w, num_splits, with_shift,
                 attn_mask):
        dense = lambda name: nn.Dense(  # noqa: E731
            self.d_model, use_bias=False, kernel_init=xavier_init,
            dtype=self.dtype, name=name,
        )
        q = dense("q_proj")(source)
        k = dense("k_proj")(target)
        v = dense("v_proj")(target)

        if num_splits > 1:
            message = swin_window_attention(
                q, k, v, h, w, num_splits, with_shift, attn_mask
            )
        else:
            message = full_attention(q, k, v)

        message = dense("merge")(message)
        message = nn.LayerNorm(dtype=self.dtype, name="norm1")(message)

        if not self.no_ffn:
            hcat = jnp.concatenate([source, message], axis=-1)
            hcat = nn.Dense(self.d_model * 2 * self.ffn_dim_expansion,
                            use_bias=False, kernel_init=xavier_init,
                            dtype=self.dtype, name="mlp1")(hcat)
            hcat = nn.gelu(hcat, approximate=False)
            message = nn.Dense(self.d_model, use_bias=False,
                               kernel_init=xavier_init, dtype=self.dtype,
                               name="mlp2")(hcat)
            message = nn.LayerNorm(dtype=self.dtype, name="norm2")(message)
        return source + message


class TransformerBlock(nn.Module):
    """self-attn + cross-attn + FFN (``GMM2M.py:369-410``)."""

    d_model: int
    ffn_dim_expansion: int = 4
    dtype: Any = None

    @nn.compact
    def __call__(self, source, target, *, h, w, num_splits, with_shift,
                 attn_mask):
        source = TransformerLayer(
            self.d_model, no_ffn=True, dtype=self.dtype, name="self_attn"
        )(source, source, h=h, w=w, num_splits=num_splits,
          with_shift=with_shift, attn_mask=attn_mask)
        return TransformerLayer(
            self.d_model, ffn_dim_expansion=self.ffn_dim_expansion,
            dtype=self.dtype, name="cross_attn_ffn",
        )(source, target, h=h, w=w, num_splits=num_splits,
          with_shift=with_shift, attn_mask=attn_mask)


class FeatureTransformer(nn.Module):
    """Bidirectional 6-layer feature transformer (``GMM2M.py:464-532``):
    both directions are folded into the batch axis; odd layers use shifted
    windows."""

    num_layers: int = 6
    d_model: int = 128
    ffn_dim_expansion: int = 4
    dtype: Any = None

    @nn.compact
    def __call__(
        self, feature0: Array, feature1: Array, num_splits: int = 2
    ) -> tuple[Array, Array]:
        B, H, W, C = feature0.shape
        assert C == self.d_model

        mask = None
        if num_splits > 1:
            mask = jnp.asarray(shifted_window_attn_mask(H, W, num_splits))

        f0 = feature0.reshape(B, H * W, C)
        f1 = feature1.reshape(B, H * W, C)
        concat0 = jnp.concatenate([f0, f1], axis=0)
        concat1 = jnp.concatenate([f1, f0], axis=0)

        for i in range(self.num_layers):
            concat0 = TransformerBlock(
                self.d_model, self.ffn_dim_expansion, dtype=self.dtype,
                name=f"layer{i}",
            )(concat0, concat1, h=H, w=W, num_splits=num_splits,
              with_shift=num_splits > 1 and i % 2 == 1, attn_mask=mask)
            a, b = jnp.split(concat0, 2, axis=0)
            concat1 = jnp.concatenate([b, a], axis=0)

        f0, f1 = jnp.split(concat0, 2, axis=0)
        return f0.reshape(B, H, W, C), f1.reshape(B, H, W, C)


class SelfAttnPropagation(nn.Module):
    """Flow propagation by feature self-attention (``GMM2M.py:535-562``).

    Note the reference quirk kept here: ``key = k_proj(q_proj(feature))`` —
    the key projection is applied on top of the query projection.
    """

    in_channels: int
    dtype: Any = None

    @nn.compact
    def __call__(self, feature0: Array, value: Array) -> Array:
        B, H, W, C = feature0.shape
        q = nn.Dense(C, kernel_init=xavier_init, dtype=self.dtype,
                     name="q_proj")(feature0.reshape(B, H * W, C))
        k = nn.Dense(C, kernel_init=xavier_init, dtype=self.dtype,
                     name="k_proj")(q)
        v = value.reshape(B, H * W, -1)
        scores = jnp.einsum(
            "blc,bmc->blm", q, k, preferred_element_type=jnp.float32
        ) / (C ** 0.5)
        prob = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
        out = jnp.einsum("blm,bmv->blv", prob, v,
                         preferred_element_type=jnp.float32)
        return out.reshape(B, H, W, -1).astype(value.dtype)


def feature_add_position(
    feature0: Array, feature1: Array, num_splits: int, channels: int
) -> tuple[Array, Array]:
    """Add sine PE (windowed when num_splits > 1) (``GMM2M.py:565-585``)."""
    if num_splits > 1:
        f0 = split_windows(feature0, num_splits)
        f1 = split_windows(feature1, num_splits)
        pos = position_embedding_sine(
            f0.shape[1], f0.shape[2], channels // 2, dtype=f0.dtype
        )
        return (
            merge_windows(f0 + pos, num_splits),
            merge_windows(f1 + pos, num_splits),
        )
    pos = position_embedding_sine(
        feature0.shape[1], feature0.shape[2], channels // 2,
        dtype=feature0.dtype,
    )
    return feature0 + pos, feature1 + pos


def global_correlation_softmax(
    feature0: Array, feature1: Array
) -> tuple[Array, Array, Array]:
    """All-pairs correlation -> softmax correspondence -> bidirectional flow
    + dual-softmax certainty (``GMM2M.py:607-633``).

    Returns ``(f01, f10, dual_prob)`` with flows NHWC ``(fx, fy)`` and
    ``dual_prob`` of shape ``(B, H*W, H*W)``.
    """
    B, H, W, C = feature0.shape
    f0 = feature0.reshape(B, H * W, C)
    f1 = feature1.reshape(B, H * W, C)
    corr = jnp.einsum(
        "blc,bmc->blm", f0, f1, preferred_element_type=jnp.float32
    ) / (C ** 0.5)

    gy, gx = jnp.meshgrid(
        jnp.arange(H, dtype=jnp.float32),
        jnp.arange(W, dtype=jnp.float32), indexing="ij",
    )
    grid = jnp.stack([gx, gy], -1).reshape(1, H * W, 2)

    prob01 = jax.nn.softmax(corr, axis=-1)
    prob10 = jax.nn.softmax(corr.transpose(0, 2, 1), axis=-1)

    corr01 = jnp.einsum("blm,bmv->blv", prob01, jnp.broadcast_to(grid, (B, H * W, 2)))
    corr10 = jnp.einsum("blm,bmv->blv", prob10, jnp.broadcast_to(grid, (B, H * W, 2)))

    f01 = (corr01 - grid).reshape(B, H, W, 2).astype(feature0.dtype)
    f10 = (corr10 - grid).reshape(B, H, W, 2).astype(feature0.dtype)
    dual_prob = prob01 * prob10.transpose(0, 2, 1)
    return f01, f10, dual_prob
