"""GM-base utilities: convex upsampling, consistency masks, boundary masks."""

import numpy as np
import jax.numpy as jnp

from videoframeinterpolation_tpu.models.gmbase import (
    compute_out_of_boundary_mask,
    convex_upsample,
    forward_backward_consistency_check,
)


def test_convex_upsample_uniform_mask_is_center_copy():
    """With logits favoring the center tap only, upsampling replicates each
    coarse value into its fxf block."""
    rng = np.random.default_rng(0)
    flow = jnp.asarray(rng.standard_normal((1, 4, 6, 2)).astype(np.float32))
    # strongly select neighborhood index 4 (the center of the 3x3).
    mask = np.full((1, 4, 6, 9, 16), -1e4, np.float32)
    mask[:, :, :, 4, :] = 1e4
    up = np.asarray(convex_upsample(flow, jnp.asarray(mask), 4))
    assert up.shape == (1, 16, 24, 2)
    expect = np.kron(np.asarray(flow)[0, :, :, 0], np.ones((4, 4)))
    np.testing.assert_allclose(up[0, :, :, 0], expect, rtol=1e-4, atol=1e-5)


def test_fb_consistency_flags_inconsistent_flow():
    H = W = 8
    zero = jnp.zeros((1, H, W, 2))
    occ_f, occ_b = forward_backward_consistency_check(zero, zero)
    assert float(occ_f.sum()) == 0.0 and float(occ_b.sum()) == 0.0

    # f01 = +5px, f10 = +5px (NOT the inverse): cycle error 10px >> bound.
    f01 = jnp.full((1, H, W, 2), 5.0)
    f10 = jnp.full((1, H, W, 2), 5.0)
    occ_f, _ = forward_backward_consistency_check(f01, f10)
    assert float(occ_f.mean()) > 0.9


def test_out_of_boundary_mask():
    H, W = 6, 8
    flow = jnp.zeros((1, H, W, 2))
    m = compute_out_of_boundary_mask(flow)
    np.testing.assert_allclose(np.asarray(m), 1.0)
    big = jnp.full((1, H, W, 2), 100.0)
    np.testing.assert_allclose(
        np.asarray(compute_out_of_boundary_mask(big)), 0.0)
