"""GMFlow CNN backbone (reference ``models/archive/GMM2M.py:100-210``):
InstanceNorm residual blocks at 1/2, 1/4, 1/8 plus an optional multi-scale
trident conv head (shared weights applied at several strides)."""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

Array = jax.Array

kaiming_out = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


def _instance_norm(x: Array) -> Array:
    """InstanceNorm2d (no affine, per-sample per-channel over HW)."""
    mean = jnp.mean(x, axis=(1, 2), keepdims=True)
    var = jnp.var(x, axis=(1, 2), keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + 1e-5)


class GMResidualBlock(nn.Module):
    planes: int
    stride: int = 1
    dilation: int = 1
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        d = self.dilation
        y = nn.Conv(self.planes, (3, 3), strides=(self.stride, self.stride),
                    padding=((d, d), (d, d)), kernel_dilation=(d, d),
                    use_bias=False, kernel_init=kaiming_out,
                    dtype=self.dtype, name="conv1")(x)
        y = nn.relu(_instance_norm(y))
        y = nn.Conv(self.planes, (3, 3), padding=((d, d), (d, d)),
                    kernel_dilation=(d, d), use_bias=False,
                    kernel_init=kaiming_out, dtype=self.dtype,
                    name="conv2")(y)
        y = nn.relu(_instance_norm(y))
        if self.stride != 1 or x.shape[-1] != self.planes:
            x = nn.Conv(self.planes, (1, 1),
                        strides=(self.stride, self.stride), use_bias=True,
                        kernel_init=kaiming_out, dtype=self.dtype,
                        name="downsample")(x)
            x = _instance_norm(x)
        return nn.relu(x + y)


class GMCNNEncoder(nn.Module):
    """1/8-resolution feature extractor; ``num_output_scales > 1`` adds a
    trident conv producing a pyramid with shared weights."""

    output_dim: int = 128
    feature_dims: Sequence[int] = (64, 96, 128)
    num_output_scales: int = 1
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array):
        f0, f1, f2 = self.feature_dims
        h = nn.Conv(f0, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                    use_bias=False, kernel_init=kaiming_out,
                    dtype=self.dtype, name="conv1")(x)
        h = nn.relu(_instance_norm(h))
        h = GMResidualBlock(f0, 1, dtype=self.dtype, name="l1a")(h)
        h = GMResidualBlock(f0, 1, dtype=self.dtype, name="l1b")(h)
        h = GMResidualBlock(f1, 2, dtype=self.dtype, name="l2a")(h)
        h = GMResidualBlock(f1, 1, dtype=self.dtype, name="l2b")(h)
        stride3 = 2 if self.num_output_scales == 1 else 1
        h = GMResidualBlock(f2, stride3, dtype=self.dtype, name="l3a")(h)
        h = GMResidualBlock(f2, 1, dtype=self.dtype, name="l3b")(h)
        h = nn.Conv(self.output_dim, (1, 1), kernel_init=kaiming_out,
                    dtype=self.dtype, name="conv2")(h)

        if self.num_output_scales == 1:
            return h

        # Multi-scale trident conv: one shared 3x3 kernel applied at
        # several strides (GMM2M.py:17-97).
        strides = {2: (1, 2), 3: (1, 2, 4), 4: (1, 2, 4, 8)}[
            self.num_output_scales
        ]
        kernel = self.param(
            "trident_kernel",
            nn.initializers.variance_scaling(2.0, "fan_in", "uniform"),
            (3, 3, self.output_dim, self.output_dim), jnp.float32,
        )
        outs = []
        for s in strides:
            outs.append(jax.lax.conv_general_dilated(
                h, kernel.astype(h.dtype), (s, s), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ))
        return tuple(outs)
