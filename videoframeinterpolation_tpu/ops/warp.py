"""Backward / forward warping ops (reference ``modules/warp.py``).

All flows are ``(..., 2)`` with ``(fx, fy)`` in pixel units, images NHWC.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .interp import grid_sample
from .softsplat import softsplat, softsplat_raw

Array = jax.Array


def _base_grid(B: int, H: int, W: int) -> Array:
    gy, gx = jnp.meshgrid(
        jnp.arange(H, dtype=jnp.float32),
        jnp.arange(W, dtype=jnp.float32),
        indexing="ij",
    )
    grid = jnp.stack([gx, gy], axis=-1)  # (H, W, 2) as (x, y)
    return jnp.broadcast_to(grid[None], (B, H, W, 2))


def bwarp(img: Array, flow: Array) -> Array:
    """Backward warp: sample ``img`` at ``p + flow(p)``.

    Matches reference ``bwarp`` (``modules/warp.py:7-15``): bilinear,
    border padding, align_corners=True.

    Args:
      img: ``(B, H, W, C)``.
      flow: ``(B, H, W, 2)`` as ``(fx, fy)`` pixels.
    """
    B, H, W, _ = flow.shape
    coords = _base_grid(B, H, W) + flow.astype(jnp.float32)
    return grid_sample(img, coords, padding_mode="border")


def fwarp(
    x: Array, flow: Array, metric: Array | None = None, mode: str = "soft"
) -> Array:
    """Forward (splatting) warp; see :func:`..ops.softsplat.softsplat`."""
    return softsplat(x, flow, metric, mode)


def _one_fdir(x: Array, flow: Array, td: Array, metric: Array) -> tuple[Array, Array]:
    """One splat direction of the M2M merge (reference ``modules/warp.py:69-74``)."""
    m = jnp.exp(jnp.clip(metric, -20.0, 20.0))
    inp = jnp.concatenate([x * td * m, td * m], axis=-1)
    out = softsplat_raw(inp, flow)
    return out[..., :-1], out[..., -1:] + 1e-7


def fwarp_using_two_frames(
    x0: Array,
    flow0: Array,
    t0: Array,
    x1: Array,
    flow1: Array,
    t1: Array,
    metric0: Array,
    metric1: Array,
) -> tuple[Array, Array]:
    """Merge two splat directions (reference ``modules/warp.py:68-83``).

    Returns ``(blended, hole_mask)`` where ``hole_mask`` flags pixels whose
    combined normalization mass is below 1e-5.
    """
    out_f, norm_f = _one_fdir(x0, flow0, t0, metric0)
    out_b, norm_b = _one_fdir(x1, flow1, t1, metric1)
    out = out_f + out_b
    norm = norm_f + norm_b
    return out / norm, norm < 1e-5


def fwarp_mframes(
    x0: Array,
    flows0: Array,
    t0: Array,
    x1: Array,
    flows1: Array,
    t1: Array,
    metric0: Array,
    metric1: Array,
) -> tuple[Array, Array]:
    """M2M multi-branch forward warp (reference ``modules/warp.py:86-113``).

    Instead of the reference's Python loop over branches, the branch axis is
    folded into the batch axis so the whole multi-hypothesis splat is one
    scatter — the idiomatic XLA formulation.

    Args:
      x0 / x1: ``(B, H, W, C)`` (shared across branches).
      flows0 / flows1: ``(n_branch, B, H, W, 2)`` per-branch flows.
      t0 / t1: ``(n_branch, B, 1, 1, 1)`` time weights.
      metric0 / metric1: ``(B, H, W, 1)`` importance metrics (shared).
    """
    nb, B, H, W, _ = flows0.shape
    C = x0.shape[-1]

    def fold(v, reps):
        return jnp.broadcast_to(v[None], (reps,) + v.shape).reshape(
            (reps * v.shape[0],) + v.shape[1:]
        )

    x0r = fold(x0, nb)
    x1r = fold(x1, nb)
    m0r = fold(metric0, nb)
    m1r = fold(metric1, nb)
    f0r = flows0.reshape(nb * B, H, W, 2)
    f1r = flows1.reshape(nb * B, H, W, 2)
    t0r = t0.reshape(nb * B, 1, 1, 1)
    t1r = t1.reshape(nb * B, 1, 1, 1)

    out_f, norm_f = _one_fdir(x0r, f0r, t0r, m0r)
    out_b, norm_b = _one_fdir(x1r, f1r, t1r, m1r)
    out = (out_f + out_b).reshape(nb, B, H, W, C).sum(axis=0)
    norm = (norm_f + norm_b).reshape(nb, B, H, W, 1).sum(axis=0)
    return out / norm, norm < 1e-5
