"""Modulated deformable convolution (DCNv2) as gather + grouped matmul.

TPU-native replacement for ``torchvision.ops.deform_conv2d`` (native
component N2 in SURVEY.md section 2.6; used by the reference at
``modules/dcnv2.py:60-66``).

Formulation: for each output pixel ``p``, offset group ``g`` and kernel tap
``k`` at relative position ``(ky, kx)``, bilinearly sample the input at
``p + (kx, ky) - pad + offset[p, g, k]`` with *zeros* out-of-bounds padding
(torchvision semantics), modulate by ``mask[p, g, k]``, then contract the
``(tap, in-channel)`` axes against the grouped conv weight. The contraction
is one large ``(B*H*W) x (K*K*Cg) x (Cout/G)`` matmul per group — exactly the
shape the MXU wants — and the sampling is four batched gathers shared across
the group's channels.

Layout conventions (clean re-design, not the torchvision channel packing):
  * ``offset``: ``(B, H, W, G, K*K, 2)`` as ``(dx, dy)`` pixels.
  * ``mask``:   ``(B, H, W, G, K*K)``.
  * ``weight``: ``(G, K*K, Cin/G, Cout/G)`` — grouped conv, taps ordered
    row-major ``(ky, kx)`` like a 3x3 conv kernel.

The reference's offset channel packing quirk (``modules/dcnv2.py:54-57``
mixes a ``[all-dy, all-dx]`` residual with an interleaved ``[fy, fx]`` base)
is intentionally NOT reproduced: models here are trained from scratch, so the
clean layout is strictly better; behaviour that matters (zero-init residual
bounded by ``2*tanh``, sigmoid mask, flow-seeded base offsets) is preserved
in the ``DeformableConv2d`` module (``nn/dcn_layer.py``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def deform_conv2d(
    x: Array,
    offset: Array,
    mask: Array,
    weight: Array,
    bias: Array | None = None,
    *,
    kernel_size: int = 3,
    padding: int = 1,
) -> Array:
    """Stride-1 modulated deformable conv (the only config the reference uses).

    Args:
      x: ``(B, H, W, Cin)``.
      offset: ``(B, H, W, G, K*K, 2)`` ``(dx, dy)`` pixel offsets.
      mask: ``(B, H, W, G, K*K)`` modulation in [0, 1].
      weight: ``(G, K*K, Cin/G, Cout/G)``.
      bias: ``(Cout,)`` or None.

    Returns:
      ``(B, H, W, Cout)``.
    """
    B, H, W, Cin = x.shape
    G, KK, Cg, CoutG = weight.shape
    K = kernel_size
    assert KK == K * K, (KK, K)
    assert Cg * G == Cin, (weight.shape, x.shape)

    # Base sampling positions: output pixel + kernel tap - padding.
    gy, gx = jnp.meshgrid(
        jnp.arange(H, dtype=jnp.float32),
        jnp.arange(W, dtype=jnp.float32),
        indexing="ij",
    )
    ky, kx = jnp.meshgrid(
        jnp.arange(K, dtype=jnp.float32) - padding,
        jnp.arange(K, dtype=jnp.float32) - padding,
        indexing="ij",
    )
    kx = kx.reshape(KK)
    ky = ky.reshape(KK)

    off = offset.astype(jnp.float32)
    # (B, H, W, G, KK)
    sx = gx[None, :, :, None, None] + kx[None, None, None, None, :] + off[..., 0]
    sy = gy[None, :, :, None, None] + ky[None, None, None, None, :] + off[..., 1]

    # One quad-packed row gather per (group, tap) sample — the TPU-native
    # bilinear path (see ops/interp.py:build_quad_table).
    from .interp import grid_sample

    xg = x.reshape(B, H * W, G, Cg).transpose(0, 2, 1, 3).reshape(
        B * G, H, W, Cg
    )
    coords = jnp.stack([sx, sy], axis=-1)  # (B, H, W, G, KK, 2)
    coords = coords.transpose(0, 3, 1, 2, 4, 5).reshape(B * G, H * W * KK, 2)
    samples = grid_sample(xg, coords, padding_mode="zeros")
    samples = samples.reshape(B, G, H * W, KK, Cg)
    samples = samples * mask.transpose(0, 3, 1, 2, 4).reshape(
        B, G, H * W, KK, 1
    ).astype(x.dtype)

    # Grouped contraction on the MXU: (B,G,N,KK,Cg) x (G,KK,Cg,CoutG).
    out = jnp.einsum(
        "bgnkc,gkcd->bngd", samples, weight.astype(x.dtype),
        preferred_element_type=jnp.float32,
    )
    out = out.reshape(B, H, W, G * CoutG).astype(x.dtype)
    if bias is not None:
        out = out + bias.astype(x.dtype)
    return out
