"""Deformable conv vs a dense numpy reference of torchvision's semantics.

torchvision.ops.deform_conv2d (the reference's native op, modules/dcnv2.py:60)
samples input at p + kernel_offset + learned_offset with bilinear
interpolation and ZERO padding out of bounds, modulates by the mask, and runs
a grouped conv. This test pins those semantics for our clean layout.
"""

import numpy as np
import jax.numpy as jnp

from videoframeinterpolation_tpu.ops import deform_conv2d


def _bilinear_zero(x, y_pos, x_pos):
    """Sample x[(H,W,C)] at float (y_pos, x_pos) with zero padding."""
    H, W, C = x.shape
    x0, y0 = int(np.floor(x_pos)), int(np.floor(y_pos))
    wx, wy = x_pos - x0, y_pos - y0
    out = np.zeros((C,), np.float32)
    for (xi, yi, w) in (
        (x0, y0, (1 - wx) * (1 - wy)),
        (x0 + 1, y0, wx * (1 - wy)),
        (x0, y0 + 1, (1 - wx) * wy),
        (x0 + 1, y0 + 1, wx * wy),
    ):
        if 0 <= xi < W and 0 <= yi < H:
            out = out + w * x[yi, xi]
    return out


def _np_deform_conv(x, offset, mask, weight, bias, K=3, pad=1):
    B, H, W, Cin = x.shape
    G, KK, Cg, CoutG = weight.shape
    out = np.zeros((B, H, W, G * CoutG), np.float32)
    for b in range(B):
        for h in range(H):
            for w_ in range(W):
                for g in range(G):
                    acc = np.zeros((CoutG,), np.float32)
                    for k in range(KK):
                        ky, kx = k // K - pad, k % K - pad
                        dy = offset[b, h, w_, g, k, 1]
                        dx = offset[b, h, w_, g, k, 0]
                        sample = _bilinear_zero(
                            x[b, :, :, g * Cg:(g + 1) * Cg],
                            h + ky + dy, w_ + kx + dx,
                        )
                        acc += mask[b, h, w_, g, k] * np.dot(sample, weight[g, k])
                    out[b, h, w_, g * CoutG:(g + 1) * CoutG] = acc
    if bias is not None:
        out = out + bias
    return out


def test_deform_conv_matches_numpy():
    rng = np.random.default_rng(0)
    B, H, W = 1, 6, 7
    G, Cg, CoutG, K = 2, 3, 4, 3
    Cin = G * Cg
    x = rng.standard_normal((B, H, W, Cin)).astype(np.float32)
    offset = (rng.standard_normal((B, H, W, G, K * K, 2)) * 1.5).astype(np.float32)
    mask = rng.uniform(0, 1, (B, H, W, G, K * K)).astype(np.float32)
    weight = rng.standard_normal((G, K * K, Cg, CoutG)).astype(np.float32)
    bias = rng.standard_normal((G * CoutG,)).astype(np.float32)

    ours = np.asarray(deform_conv2d(
        jnp.asarray(x), jnp.asarray(offset), jnp.asarray(mask),
        jnp.asarray(weight), jnp.asarray(bias),
    ))
    ref = _np_deform_conv(x, offset, mask, weight, bias)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_deform_conv_zero_offset_equals_conv():
    """With zero offsets and unit mask, DCN == a plain grouped 3x3 conv."""
    import jax

    rng = np.random.default_rng(1)
    B, H, W = 2, 8, 8
    G, Cg, CoutG, K = 2, 4, 4, 3
    Cin = G * Cg
    x = rng.standard_normal((B, H, W, Cin)).astype(np.float32)
    weight = rng.standard_normal((G, K * K, Cg, CoutG)).astype(np.float32)
    offset = np.zeros((B, H, W, G, K * K, 2), np.float32)
    mask = np.ones((B, H, W, G, K * K), np.float32)

    ours = np.asarray(deform_conv2d(
        jnp.asarray(x), jnp.asarray(offset), jnp.asarray(mask),
        jnp.asarray(weight), None,
    ))

    # lax grouped conv reference: kernel HWIO with feature_group_count=G.
    wk = weight.reshape(G, K, K, Cg, CoutG).transpose(1, 2, 0, 3, 4)
    wk = wk.reshape(K, K, G * Cg, CoutG)
    # feature_group_count expects I = Cin/G; build (K,K,Cg,G*CoutG) ordering:
    wk2 = weight.reshape(G, K, K, Cg, CoutG).transpose(1, 2, 3, 0, 4).reshape(
        K, K, Cg, G * CoutG
    )
    conv = jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(wk2), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=G,
    )
    np.testing.assert_allclose(ours, np.asarray(conv), rtol=1e-4, atol=1e-4)
