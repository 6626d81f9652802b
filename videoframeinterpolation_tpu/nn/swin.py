"""Swin-style windowed cross-attention decoders (reference
``models/archive/GMTrans.py:39-314``).

``WindowAttention`` carries a learned relative-position bias;
``SwinIRBlock`` applies (optionally shifted) window cross-attention from a
query map onto a source feature map; ``BasicLayer`` attends the query onto
BOTH frames with one shared block per depth and mixes with a conv;
``SwinDecoder3/2`` stack these (GMTrans/DCNTrans/RSTT decoders).

Everything is reshape + einsum — direct MXU work under XLA.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn
import numpy as np

from .blocks import PReLU, conv

Array = jax.Array

trunc02 = nn.initializers.truncated_normal(stddev=0.02)
xavier_init = nn.initializers.xavier_uniform()


@functools.lru_cache(maxsize=16)
def _relative_position_index(wh: int, ww: int) -> np.ndarray:
    coords = np.stack(np.meshgrid(np.arange(wh), np.arange(ww),
                                  indexing="ij"))  # (2, wh, ww)
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]  # (2, N, N)
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += wh - 1
    rel[:, :, 1] += ww - 1
    rel[:, :, 0] *= 2 * ww - 1
    return rel.sum(-1)  # (N, N)


@functools.lru_cache(maxsize=32)
def _shift_attn_mask(hp: int, wp: int, ws: int, ss: int) -> np.ndarray:
    """Shifted-window additive mask (``GMTrans.py:243-270``):
    ``(nW, N, N)`` with -100 across region boundaries."""
    img = np.zeros((hp, wp), np.float32)
    cnt = 0
    for hs in (slice(0, -ws), slice(-ws, -ss), slice(-ss, None)):
        for wsl in (slice(0, -ws), slice(-ws, -ss), slice(-ss, None)):
            img[hs, wsl] = cnt
            cnt += 1
    m = img.reshape(hp // ws, ws, wp // ws, ws).transpose(0, 2, 1, 3)
    m = m.reshape(-1, ws * ws)
    mask = m[:, None, :] - m[:, :, None]
    return np.where(mask != 0, -100.0, 0.0).astype(np.float32)


def window_partition(x: Array, ws: tuple[int, int]) -> Array:
    """(B, H, W, C) -> (B*nW, wh, ww, C) (``GMTrans.py:100-104``)."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // ws[0], ws[0], W // ws[1], ws[1], C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws[0], ws[1], C)


def window_reverse(win: Array, ws: tuple[int, int], B: int, H: int,
                   W: int) -> Array:
    x = win.reshape(B, H // ws[0], W // ws[1], ws[0], ws[1], -1)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(B, H, W, -1)


class WindowAttention(nn.Module):
    """Cross window attention with relative position bias
    (``GMTrans.py:39-97``)."""

    dim: int
    window_size: tuple[int, int]
    num_heads: int
    dtype: Any = None

    @nn.compact
    def __call__(self, q: Array, kv: Array, mask: Array | None = None) -> Array:
        B_, N, C = q.shape
        nh = self.num_heads
        hc = C // nh
        scale = hc ** -0.5

        qp = nn.Dense(self.dim, kernel_init=trunc02, dtype=self.dtype,
                      name="q_proj")(q)
        kvp = nn.Dense(self.dim * 2, kernel_init=trunc02, dtype=self.dtype,
                       name="kv_proj")(kv)
        k, v = jnp.split(kvp, 2, axis=-1)

        qp = qp.reshape(B_, N, nh, hc).transpose(0, 2, 1, 3) * scale
        k = k.reshape(B_, N, nh, hc).transpose(0, 2, 1, 3)
        v = v.reshape(B_, N, nh, hc).transpose(0, 2, 1, 3)

        attn = jnp.einsum("bhnc,bhmc->bhnm", qp, k,
                          preferred_element_type=jnp.float32)

        wh, ww = self.window_size
        table = self.param(
            "relative_position_bias_table", trunc02,
            ((2 * wh - 1) * (2 * ww - 1), nh), jnp.float32,
        )
        idx = jnp.asarray(_relative_position_index(wh, ww))
        bias = table[idx.reshape(-1)].reshape(N, N, nh).transpose(2, 0, 1)
        attn = attn + bias[None].astype(attn.dtype)

        if mask is not None:
            nW = mask.shape[0]
            attn = attn.reshape(B_ // nW, nW, nh, N, N)
            attn = attn + mask[None, :, None].astype(attn.dtype)
            attn = attn.reshape(B_, nh, N, N)
        attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)

        out = jnp.einsum("bhnm,bhmc->bhnc", attn, v,
                         preferred_element_type=jnp.float32)
        out = out.transpose(0, 2, 1, 3).reshape(B_, N, C).astype(q.dtype)
        return nn.Dense(self.dim, kernel_init=trunc02, dtype=self.dtype,
                        name="proj")(out)


class SwinIRBlock(nn.Module):
    """(Shifted-)window cross-attention block (``GMTrans.py:144-215``)."""

    dim: int
    num_heads: int
    window_size: int = 4
    shift_size: int = 0
    mlp_ratio: float = 4.0
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array, feat: Array) -> Array:
        B, H, W, C = x.shape
        ws = min(self.window_size, H, W)
        ss = self.shift_size if ws == self.window_size else 0

        shortcut = x
        pad_h = (ws - H % ws) % ws
        pad_w = (ws - W % ws) % ws
        if pad_h or pad_w:
            x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
            feat = jnp.pad(feat, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
        Hp, Wp = H + pad_h, W + pad_w

        mask = None
        if ss > 0:
            x = jnp.roll(x, (-ss, -ss), axis=(1, 2))
            feat = jnp.roll(feat, (-ss, -ss), axis=(1, 2))
            mask = jnp.asarray(_shift_attn_mask(Hp, Wp, ws, ss))

        xw = window_partition(x, (ws, ws)).reshape(-1, ws * ws, C)
        fw = window_partition(feat, (ws, ws)).reshape(-1, ws * ws, C)

        attn = WindowAttention(self.dim, (ws, ws), self.num_heads,
                               dtype=self.dtype, name="attn")(xw, fw, mask)

        x = window_reverse(attn.reshape(-1, ws, ws, C), (ws, ws), B, Hp, Wp)
        if ss > 0:
            x = jnp.roll(x, (ss, ss), axis=(1, 2))
        if pad_h or pad_w:
            x = x[:, :H, :W, :]

        x = nn.Dense(self.dim, use_bias=False, kernel_init=trunc02,
                     dtype=self.dtype, name="merge")(x)
        x = nn.LayerNorm(dtype=self.dtype, name="norm1")(x)
        x = shortcut + x

        h = nn.Dense(int(self.dim * self.mlp_ratio), kernel_init=trunc02,
                     dtype=self.dtype, name="mlp1")(x)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(self.dim, kernel_init=trunc02, dtype=self.dtype,
                     name="mlp2")(h)
        return x + nn.LayerNorm(dtype=self.dtype, name="norm2")(h)


class SwinBasicLayer(nn.Module):
    """Per depth: ONE shared block attends the query onto both frames; a
    conv mixes the two attended maps (``GMTrans.py:218-280``)."""

    dim: int
    depth: int
    num_heads: int
    window_size: int
    mlp_ratio: float = 4.0
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array, source: Array, target: Array) -> Array:
        for i in range(self.depth):
            blk = SwinIRBlock(
                self.dim, self.num_heads, self.window_size,
                shift_size=0 if i % 2 == 0 else self.window_size // 2,
                mlp_ratio=self.mlp_ratio, dtype=self.dtype, name=f"block{i}",
            )
            a = blk(x, source)
            b = blk(x, target)
            h = jnp.concatenate([a, b], axis=-1)
            h = conv(self.dim, dtype=self.dtype, name=f"mixer{i}")(h)
            x = PReLU(self.dim, name=f"mixer{i}_prelu")(h)
        return x


class SwinDecoder(nn.Module):
    """``Decoder3``/``Decoder2`` (``GMTrans.py:283-314``): BasicLayer with
    an optional ConvTranspose 2x upsample head."""

    dim: int
    depth: int
    num_heads: int
    window_size: int
    mlp_ratio: float = 4.0
    upsample_to: int | None = None  # out channels of the ConvTranspose head
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array, source: Array, target: Array) -> Array:
        x = SwinBasicLayer(self.dim, self.depth, self.num_heads,
                           self.window_size, self.mlp_ratio,
                           dtype=self.dtype, name="transformer")(
            x, source, target)
        if self.upsample_to is not None:
            from .blocks import conv_transpose_x2

            x = conv_transpose_x2(self.upsample_to, dtype=self.dtype,
                                  name="upconv")(x)
        return x
