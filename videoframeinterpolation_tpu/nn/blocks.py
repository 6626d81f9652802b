"""Basic conv building blocks (reference ``modules/basic_blocks.py``), flax/NHWC.

Initialization policy mirrors the reference's training recipe:
  * plain convs: torch-default kaiming-uniform(a=sqrt(5)) equivalent
    (uniform with bound 1/sqrt(fan_in));
  * residual-block convs: 0.1-scaled kaiming-normal
    (``utils/__init__.py:8-17`` + ``modules/basic_blocks.py:27``);
  * offset/mask predictor convs: zero-init (``modules/dcnv2.py:43-47``,
    ``modules/deformable_attn.py:71-75``).
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

Array = jax.Array

# torch Conv2d default: kaiming_uniform(a=sqrt(5)) == U(+-1/sqrt(fan_in)).
torch_conv_init = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")
# 0.1-scaled kaiming normal for residual blocks: std = 0.1*sqrt(2/fan_in).
res_scaled_init = nn.initializers.variance_scaling(0.02, "fan_in", "normal")
zero_init = nn.initializers.zeros_init()


class PReLU(nn.Module):
    """Per-channel PReLU (torch ``nn.PReLU(num_parameters=C)`` semantics)."""

    features: int
    init_value: float = 0.25

    @nn.compact
    def __call__(self, x: Array) -> Array:
        alpha = self.param(
            "alpha",
            lambda key: jnp.full((self.features,), self.init_value, jnp.float32),
        )
        alpha = alpha.astype(x.dtype)
        # max+a*min instead of where(x>=0, x, a*x): identical values for
        # every finite x, but the select lowers ~2.3x slower than the conv
        # it follows on this stack while max/min/mul fuse to conv speed
        # (measured: tools/perf/conv_spatial_sweep.py — 52.5 vs 22.6 ms
        # for 8 convs at 720p). Gradient differs only at exactly x == 0
        # (JAX's max/min tie-splitting gives (1+a)/2 here vs 1 for the
        # select; torch's PReLU says a) — a measure-zero tie every
        # formulation already breaks differently.
        return jnp.maximum(x, 0) + alpha * jnp.minimum(x, 0)


def conv(
    features: int,
    kernel_size: int = 3,
    stride: int = 1,
    padding: int = 1,
    *,
    kernel_init: Callable = torch_conv_init,
    bias_init: Callable = zero_init,
    feature_group_count: int = 1,
    dtype: Any = None,
    name: str | None = None,
) -> nn.Conv:
    """Conv2d with explicit symmetric padding (torch geometry)."""
    return nn.Conv(
        features,
        (kernel_size, kernel_size),
        strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        kernel_init=kernel_init,
        bias_init=bias_init,
        feature_group_count=feature_group_count,
        dtype=dtype,
        name=name,
    )


def conv_transpose_x2(
    features: int,
    *,
    kernel_init: Callable = torch_conv_init,
    dtype: Any = None,
    name: str | None = None,
) -> nn.ConvTranspose:
    """ConvTranspose2d(kernel=4, stride=2, padding=1): exact 2x upsampling.

    The only transposed-conv config the reference uses
    (``models/DAT.py:20,25,29``, ``modules/deformable_attn.py:66``).

    Note: flax/lax transposed-conv padding counts differently from torch;
    ``((2, 2), (2, 2))`` here reproduces torch's ``padding=1`` geometry
    (output exactly ``2 * input`` with the same receptive alignment).
    """
    return nn.ConvTranspose(
        features,
        (4, 4),
        strides=(2, 2),
        padding=((2, 2), (2, 2)),
        kernel_init=kernel_init,
        bias_init=zero_init,
        dtype=dtype,
        name=name,
    )


class ConvPReLU(nn.Module):
    """conv3x3 + per-channel PReLU (``conv_prelu``, ``modules/basic_blocks.py:5-9``)."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = conv(
            self.features, self.kernel_size, self.stride, self.padding,
            dtype=self.dtype, name="conv",
        )(x)
        return PReLU(self.features, name="prelu")(x)


class ResBlock(nn.Module):
    """Residual block without BN (``ResBlocknoBN``, ``modules/basic_blocks.py:13-33``).

    conv-PReLU-conv with identity skip; convs use 0.1-scaled kaiming init.
    """

    features: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        out = conv(self.features, kernel_init=res_scaled_init,
                   dtype=self.dtype, name="conv1")(x)
        out = PReLU(self.features, name="prelu")(out)
        out = conv(self.features, kernel_init=res_scaled_init,
                   dtype=self.dtype, name="conv2")(out)
        return x + out


class ResBlocks(nn.Module):
    """A stack of N ResBlocks (``make_residual_layers``)."""

    features: int
    n_blocks: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        for i in range(self.n_blocks):
            x = ResBlock(self.features, dtype=self.dtype, name=f"block{i}")(x)
        return x


class HalfChannelConv5ResBlock(nn.Module):
    """IFRNet-style 5-conv residual block with a side channel group.

    Functional re-expression of the reference's in-place slice assignment
    (``modules/basic_blocks.py:44-73``): the last ``side_c`` channels are
    split out, refined, and concatenated back — identical math without
    mutation.
    """

    features: int
    side_features: int
    # modules/basic_blocks.py:72 activates the residual sum; the archived
    # IFRNet variant (models/archive/IFRNet.py:39-50, default act_at_last)
    # returns it raw.
    final_activation: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        c, s = self.features, self.side_features

        def refine_side(h: Array, convname: str) -> Array:
            main, side = h[..., : c - s], h[..., c - s:]
            side = conv(s, dtype=self.dtype, name=convname)(side)
            side = PReLU(s, name=convname + "_prelu")(side)
            return jnp.concatenate([main, side], axis=-1)

        out = conv(c, dtype=self.dtype, name="conv1")(x)
        out = PReLU(c, name="prelu1")(out)
        out = refine_side(out, "conv2")
        out = conv(c, dtype=self.dtype, name="conv3")(out)
        out = PReLU(c, name="prelu3")(out)
        out = refine_side(out, "conv4")
        out = conv(c, dtype=self.dtype, name="conv5")(out)
        out = x + out
        if self.final_activation:
            out = PReLU(c, name="prelu5")(out)
        return out


class FeedForward(nn.Module):
    """1x1-conv MLP (``FeadForward`` [sic], ``modules/basic_blocks.py:76-87``)."""

    hidden_features: int
    out_features: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = nn.Dense(self.hidden_features, kernel_init=torch_conv_init,
                     dtype=self.dtype, name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        return nn.Dense(self.out_features, kernel_init=torch_conv_init,
                        dtype=self.dtype, name="fc2")(x)
