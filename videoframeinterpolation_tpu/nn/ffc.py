"""Fast Fourier Convolution blocks (reference ``modules/ffc.py``, the LaMa
generator family used by the archived LAMAResidual/FFCRAFT models).

FFT-domain mixing is a strong fit for XLA-on-TPU: ``rfft2`` lowers to the
native FFT HLO and the spectral 1x1 conv is a plain matmul.

Substitution (documented): the reference uses BatchNorm2d; here a stateless
instance norm is used so the module stays purely functional (models train
from scratch; no running statistics to carry)."""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn

Array = jax.Array


def _instance_norm(x: Array) -> Array:
    mean = jnp.mean(x, axis=(1, 2), keepdims=True)
    var = jnp.var(x, axis=(1, 2), keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + 1e-5)


def _reflect_pad(x: Array, p: int) -> Array:
    return jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)), mode="reflect")


class FourierUnit(nn.Module):
    """rfft2 -> 1x1 conv on (real | imag) -> norm+relu -> irfft2
    (``modules/ffc.py:21-74``)."""

    out_channels: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        B, H, W, C = x.shape
        f = jnp.fft.rfft2(x.astype(jnp.float32), axes=(1, 2), norm="ortho")
        ff = jnp.concatenate([f.real, f.imag], axis=-1)  # (B, H, W/2+1, 2C)
        ff = ff.astype(x.dtype)
        ff = nn.Conv(self.out_channels * 2, (1, 1), use_bias=False,
                     dtype=self.dtype, name="conv")(ff)
        ff = nn.relu(_instance_norm(ff))
        re, im = jnp.split(ff.astype(jnp.float32), 2, axis=-1)
        out = jnp.fft.irfft2(jax.lax.complex(re, im), s=(H, W),
                             axes=(1, 2), norm="ortho")
        return out.astype(x.dtype)


class SpectralTransform(nn.Module):
    """1x1 reduce -> Fourier unit (+ optional local Fourier unit on 2x2
    spatial splits) -> 1x1 expand (``modules/ffc.py:77-123``)."""

    out_channels: int
    stride: int = 1
    enable_lfu: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        if self.stride == 2:
            x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        half = self.out_channels // 2
        x = nn.Conv(half, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        x = nn.relu(_instance_norm(x))
        out = FourierUnit(half, dtype=self.dtype, name="fu")(x)

        if self.enable_lfu:
            B, H, W, C = x.shape
            s = H // 2
            # Stack the four spatial quadrants of the first C/4 channels
            # along channels, run a local Fourier unit, tile back.
            xq = x[..., : C // 4]
            quads = jnp.concatenate(
                [xq[:, :s, :W // 2], xq[:, s:, :W // 2],
                 xq[:, :s, W // 2:], xq[:, s:, W // 2:]], axis=-1,
            )
            xs = FourierUnit(half, dtype=self.dtype, name="lfu")(quads)
            xs = jnp.tile(xs, (1, 2, 2, 1))
        else:
            xs = 0.0

        return nn.Conv(self.out_channels, (1, 1), use_bias=False,
                       dtype=self.dtype, name="conv2")(x + out + xs)


class FFC(nn.Module):
    """Local/global 4-way mixing conv (``modules/ffc.py:126-182``)."""

    in_channels: int
    out_channels: int
    kernel_size: int = 3
    ratio_gin: float = 0.0
    ratio_gout: float = 0.0
    stride: int = 1
    padding: int = 0
    enable_lfu: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x) -> tuple:
        x_l, x_g = x if isinstance(x, tuple) else (x, None)
        in_cg = int(self.in_channels * self.ratio_gin)
        in_cl = self.in_channels - in_cg
        out_cg = int(self.out_channels * self.ratio_gout)
        out_cl = self.out_channels - out_cg

        def conv_branch(name, out_c):
            def apply(v):
                if v is None or out_c == 0:
                    return 0.0
                h = _reflect_pad(v, self.padding) if self.padding else v
                return nn.Conv(out_c, (self.kernel_size, self.kernel_size),
                               strides=(self.stride, self.stride),
                               padding="VALID", use_bias=False,
                               dtype=self.dtype, name=name)(h)
            return apply

        out_xl, out_xg = 0.0, 0.0
        if out_cl > 0:
            out_xl = conv_branch("convl2l", out_cl)(x_l)
            if in_cg > 0:
                out_xl = out_xl + conv_branch("convg2l", out_cl)(x_g)
        if out_cg > 0:
            if in_cl > 0:
                out_xg = conv_branch("convl2g", out_cg)(x_l)
            if in_cg > 0:
                out_xg = out_xg + SpectralTransform(
                    out_cg, self.stride, self.enable_lfu, dtype=self.dtype,
                    name="convg2g")(x_g)
        return (out_xl if out_cl else None, out_xg if out_cg else None)


class FFCNormAct(nn.Module):
    """FFC + norm + ReLU on both branches (``FFC_BN_ACT``)."""

    in_channels: int
    out_channels: int
    kernel_size: int = 3
    ratio_gin: float = 0.0
    ratio_gout: float = 0.0
    stride: int = 1
    padding: int = 0
    enable_lfu: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x) -> tuple:
        x_l, x_g = FFC(
            self.in_channels, self.out_channels, self.kernel_size,
            self.ratio_gin, self.ratio_gout, self.stride, self.padding,
            self.enable_lfu, dtype=self.dtype, name="ffc",
        )(x)
        if x_l is not None:
            x_l = nn.relu(_instance_norm(x_l))
        if x_g is not None:
            x_g = nn.relu(_instance_norm(x_g))
        return x_l, x_g


class FFCResnetBlock(nn.Module):
    """Two FFC convs with dual-branch residual (``modules/ffc.py:214-245``)."""

    dim: int
    ratio: float = 0.75
    enable_lfu: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x) -> tuple:
        id_l, id_g = x
        h = FFCNormAct(self.dim, self.dim, 3, self.ratio, self.ratio,
                       padding=1, enable_lfu=self.enable_lfu,
                       dtype=self.dtype, name="conv1")(x)
        h = FFCNormAct(self.dim, self.dim, 3, self.ratio, self.ratio,
                       padding=1, enable_lfu=self.enable_lfu,
                       dtype=self.dtype, name="conv2")(h)
        x_l = (id_l + h[0]) if h[0] is not None else id_l
        x_g = (id_g + h[1]) if h[1] is not None else id_g
        return x_l, x_g


def _concat_tuple(x) -> Array:
    x_l, x_g = x
    if x_g is None:
        return x_l
    if x_l is None:
        return x_g
    return jnp.concatenate([x_l, x_g], axis=-1)


class FFCTexture(nn.Module):
    """FFC texture encoder (``modules/ffc.py:319-355``): reflect-pad 7x7
    stem, strided FFC downsampling, FFC resnet bottleneck, 1x1 head."""

    nfeats: tuple = (64, 128, 256, 256)
    n_blocks: int = 6
    resnet_ratio: float = 0.75
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        f = self.nfeats
        h = FFCNormAct(x.shape[-1], f[0], 7, 0.0, 0.0, padding=3,
                       enable_lfu=False, dtype=self.dtype, name="stem")(x)
        n_down = len(f) - 1
        for i in range(n_down):
            gout = self.resnet_ratio if i == n_down - 1 else 0.0
            h = FFCNormAct(f[i], f[i + 1], 3, 0.0, gout,
                           stride=2, padding=1, enable_lfu=False,
                           dtype=self.dtype, name=f"down{i}")(h)
        for i in range(self.n_blocks):
            h = FFCResnetBlock(f[-1], self.resnet_ratio, dtype=self.dtype,
                               name=f"res{i}")(h)
        out = _concat_tuple(h)
        return nn.Conv(f[-1], (1, 1), dtype=self.dtype, name="head")(out)


class FFCResNetGenerator(nn.Module):
    """LaMa-style generator (``modules/ffc.py:258-316``): FFC encoder,
    FFC resnet bottleneck, transposed-conv decoder, tanh output."""

    output_nc: int = 3
    ngf: int = 64
    n_downsampling: int = 3
    n_blocks: int = 6
    resnet_ratio: float = 0.75
    max_features: int = 1024
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        h = FFCNormAct(x.shape[-1], self.ngf, 7, 0.0, 0.0, padding=3,
                       enable_lfu=False, dtype=self.dtype, name="stem")(x)
        for i in range(self.n_downsampling):
            mult = 2 ** i
            gout = (self.resnet_ratio if i == self.n_downsampling - 1
                    else 0.0)
            h = FFCNormAct(
                min(self.max_features, self.ngf * mult),
                min(self.max_features, self.ngf * mult * 2),
                3, 0.0, gout, stride=2, padding=1, enable_lfu=False,
                dtype=self.dtype, name=f"down{i}",
            )(h)
        dim = min(self.max_features, self.ngf * 2 ** self.n_downsampling)
        for i in range(self.n_blocks):
            h = FFCResnetBlock(dim, self.resnet_ratio, dtype=self.dtype,
                               name=f"res{i}")(h)
        out = _concat_tuple(h)
        for i in range(self.n_downsampling):
            mult = 2 ** (self.n_downsampling - i)
            out = nn.ConvTranspose(
                min(self.max_features, int(self.ngf * mult / 2)),
                (3, 3), strides=(2, 2), padding="SAME",
                dtype=self.dtype, name=f"up{i}",
            )(out)
            out = nn.relu(_instance_norm(out))
        out = _reflect_pad(out, 3)
        out = nn.Conv(self.output_nc, (7, 7), padding="VALID",
                      dtype=self.dtype, name="out")(out)
        return jnp.tanh(out)
