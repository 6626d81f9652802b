"""Softsplat forward/backward semantics tests.

The reference's CUDA kernels (modules/softsplat.py:289-529) define: bilinear
scatter-add forward, gather input-gradient, channel-summed weight-derivative
flow-gradient. Here the forward is checked against a dense numpy scatter and
both gradients against finite differences (autodiff must reproduce the
hand-written CUDA backward semantics).
"""

import numpy as np
import jax
import jax.numpy as jnp

from videoframeinterpolation_tpu.ops import (
    softsplat_raw,
    softsplat,
    fwarp_using_two_frames,
    fwarp_mframes,
)


def _np_softsplat(x, flow):
    """Dense numpy reference of the CUDA forward (softsplat.py:289-350)."""
    B, H, W, C = x.shape
    out = np.zeros_like(x)
    for b in range(B):
        for y in range(H):
            for xx in range(W):
                tx = xx + flow[b, y, xx, 0]
                ty = y + flow[b, y, xx, 1]
                x0, y0 = int(np.floor(tx)), int(np.floor(ty))
                wx, wy = tx - x0, ty - y0
                for (xi, yi, w) in (
                    (x0, y0, (1 - wx) * (1 - wy)),
                    (x0 + 1, y0, wx * (1 - wy)),
                    (x0, y0 + 1, (1 - wx) * wy),
                    (x0 + 1, y0 + 1, wx * wy),
                ):
                    if 0 <= xi < W and 0 <= yi < H:
                        out[b, yi, xi] += w * x[b, y, xx]
    return out


def test_softsplat_raw_matches_numpy():
    rng = np.random.default_rng(0)
    B, H, W, C = 2, 6, 7, 3
    x = rng.standard_normal((B, H, W, C)).astype(np.float32)
    flow = (rng.standard_normal((B, H, W, 2)) * 2.5).astype(np.float32)
    ours = np.asarray(softsplat_raw(jnp.asarray(x), jnp.asarray(flow)))
    ref = _np_softsplat(x, flow)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_softsplat_zero_flow_is_identity():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 5, 5, 2)).astype(np.float32)
    out = np.asarray(softsplat_raw(jnp.asarray(x), jnp.zeros((1, 5, 5, 2))))
    np.testing.assert_allclose(out, x, rtol=1e-6, atol=1e-6)


def test_softsplat_gradients_vs_finite_difference():
    rng = np.random.default_rng(2)
    B, H, W, C = 1, 5, 5, 2
    x = rng.standard_normal((B, H, W, C)).astype(np.float32)
    # Keep flows away from integer lattice points (floor() kinks).
    flow = (rng.uniform(-1.2, 1.2, (B, H, W, 2)) + 0.31).astype(np.float32)
    cot = rng.standard_normal((B, H, W, C)).astype(np.float32)

    def f(xv, fv):
        return jnp.sum(softsplat_raw(xv, fv) * cot)

    gx, gf = jax.grad(f, argnums=(0, 1))(jnp.asarray(x), jnp.asarray(flow))

    eps = 1e-3
    # Finite-difference a handful of coordinates.
    for (b, y, xx, c) in [(0, 1, 1, 0), (0, 3, 2, 1), (0, 4, 4, 0)]:
        xp = x.copy(); xp[b, y, xx, c] += eps
        xm = x.copy(); xm[b, y, xx, c] -= eps
        fd = (f(jnp.asarray(xp), jnp.asarray(flow)) -
              f(jnp.asarray(xm), jnp.asarray(flow))) / (2 * eps)
        np.testing.assert_allclose(gx[b, y, xx, c], fd, rtol=2e-2, atol=2e-3)
    for (b, y, xx, d) in [(0, 1, 1, 0), (0, 2, 3, 1), (0, 4, 0, 0)]:
        fp = flow.copy(); fp[b, y, xx, d] += eps
        fm = flow.copy(); fm[b, y, xx, d] -= eps
        fd = (f(jnp.asarray(x), jnp.asarray(fp)) -
              f(jnp.asarray(x), jnp.asarray(fm))) / (2 * eps)
        np.testing.assert_allclose(gf[b, y, xx, d], fd, rtol=2e-2, atol=2e-3)


def test_fwarp_modes():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((1, 6, 6, 3)).astype(np.float32))
    flow = jnp.asarray((rng.standard_normal((1, 6, 6, 2)) * 1.5).astype(np.float32))
    metric = jnp.asarray(rng.standard_normal((1, 6, 6, 1)).astype(np.float32))

    s = softsplat(x, flow, None, "sum")
    a = softsplat(x, flow, None, "avg")
    l = softsplat(x, flow, metric, "linear")
    so = softsplat(x, flow, metric, "soft")
    for v in (s, a, l, so):
        assert v.shape == x.shape
        assert np.all(np.isfinite(np.asarray(v)))

    # soft mode with zero flow == identity (denominator e^m cancels).
    ident = softsplat(x, jnp.zeros_like(flow), metric, "soft")
    np.testing.assert_allclose(np.asarray(ident), np.asarray(x), rtol=1e-4, atol=1e-4)

    # eps variants agree away from holes.
    z = softsplat(x, flow, metric, "soft-zeroeps")
    assert z.shape == x.shape


def test_fwarp_two_frames_and_mframes_consistency():
    """fwarp_mframes with 1 branch == fwarp_using_two_frames (warp.py:86-113)."""
    rng = np.random.default_rng(4)
    B, H, W, C = 2, 6, 5, 3
    x0 = jnp.asarray(rng.standard_normal((B, H, W, C)).astype(np.float32))
    x1 = jnp.asarray(rng.standard_normal((B, H, W, C)).astype(np.float32))
    f0 = jnp.asarray((rng.standard_normal((B, H, W, 2)) * 1.2).astype(np.float32))
    f1 = jnp.asarray((rng.standard_normal((B, H, W, 2)) * 1.2).astype(np.float32))
    m0 = jnp.asarray(rng.standard_normal((B, H, W, 1)).astype(np.float32))
    m1 = jnp.asarray(rng.standard_normal((B, H, W, 1)).astype(np.float32))
    t0 = jnp.full((B, 1, 1, 1), 0.5)
    t1 = jnp.full((B, 1, 1, 1), 0.5)

    two, holes2 = fwarp_using_two_frames(x0, f0, t0, x1, f1, t1, m0, m1)
    multi, holesm = fwarp_mframes(
        x0, f0[None], t0[None], x1, f1[None], t1[None], m0, m1
    )
    np.testing.assert_allclose(np.asarray(two), np.asarray(multi), rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(holes2), np.asarray(holesm))
