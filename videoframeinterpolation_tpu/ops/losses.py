"""Loss suite (reference ``modules/losses.py``), pure-JAX / NHWC.

All losses operate on NHWC tensors; flows are ``(..., 2)`` ``(fx, fy)``.
The census/geometry patch extraction is expressed as a conv with an identity
kernel — one MXU matmul — exactly the trick the reference uses
(``modules/losses.py:22-28``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def get_robust_weight(flow_pred: Array, flow_gt: Array, beta: float) -> Array:
    """exp(-beta * EPE) on a detached prediction (``modules/losses.py:11-14``)."""
    epe = jnp.sqrt(
        jnp.sum(
            (jax.lax.stop_gradient(flow_pred) - flow_gt) ** 2,
            axis=-1,
            keepdims=True,
        )
    )
    return jnp.exp(-beta * epe)


@functools.lru_cache(maxsize=8)
def _identity_patch_kernel(patch_size: int) -> np.ndarray:
    """(P, P, 1, P*P) identity kernel: output channel k picks tap (k//P, k%P)."""
    p2 = patch_size * patch_size
    w = np.eye(p2, dtype=np.float32).reshape(patch_size, patch_size, 1, p2)
    return w


def _extract_patches(x: Array, patch_size: int) -> Array:
    """(B, H, W, 1) -> (B, H, W, P*P) neighborhood values, zero padded."""
    w = jnp.asarray(_identity_patch_kernel(patch_size), x.dtype)
    pad = patch_size // 2
    return jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(1, 1),
        padding=((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _census_transform(x: Array, patch_size: int) -> Array:
    """Soft census transform of a single-channel map (``modules/losses.py:26-31``)."""
    patches = _extract_patches(x, patch_size)
    loc_diff = patches - x
    return loc_diff / jnp.sqrt(0.81 + loc_diff**2)


def _valid_mask(shape: tuple[int, ...], patch_size: int, dtype) -> Array:
    pad = patch_size // 2
    B, H, W = shape[0], shape[1], shape[2]
    inner = jnp.ones((B, H - 2 * pad, W - 2 * pad, 1), dtype)
    return jnp.pad(inner, ((0, 0), (pad, pad), (pad, pad), (0, 0)))


def ternary_loss(x: Array, y: Array, patch_size: int = 7) -> Array:
    """Census loss on grayscale means (``Ternary``, ``modules/losses.py:17-47``).

    ``y`` (the ground truth side) is detached as in the reference (:43).
    """
    gx = jnp.mean(x, axis=-1, keepdims=True)
    gy = jnp.mean(y, axis=-1, keepdims=True)
    dx = _census_transform(gx, patch_size)
    dy = jax.lax.stop_gradient(_census_transform(gy, patch_size))
    diff = dx - dy
    dist = jnp.mean(diff**2 / (0.1 + diff**2), axis=-1, keepdims=True)
    mask = _valid_mask(x.shape, patch_size, x.dtype)
    return jnp.mean(dist * mask)


def geometry_loss(x: Array, y: Array, patch_size: int = 3) -> Array:
    """Per-channel feature census loss (``Geometry``, ``modules/losses.py:50-82``).

    Neither side is detached (used feature-vs-feature, both live).
    """
    assert x.shape == y.shape, (x.shape, y.shape)
    B, H, W, C = x.shape

    def transform(t):
        t_ = t.transpose(0, 3, 1, 2).reshape(B * C, H, W, 1)
        d = _census_transform(t_, patch_size)
        # (B*C, H, W, P2) -> (B, H, W, C*P2); channel-major like the
        # reference's reshape(b, c*(p**2), h, w) — ordering only needs to be
        # consistent between x and y for the loss value.
        return d.reshape(B, C, H, W, -1).transpose(0, 2, 3, 1, 4).reshape(
            B, H, W, -1
        )

    diff = transform(x) - transform(y)
    dist = jnp.mean(diff**2 / (0.1 + diff**2), axis=-1, keepdims=True)
    mask = _valid_mask(x.shape, patch_size, x.dtype)
    return jnp.mean(dist * mask)


def charbonnier_l1(diff: Array, mask: Array | None = None) -> Array:
    """``Charbonnier_L1`` (``modules/losses.py:85-94``)."""
    loss = jnp.sqrt(diff**2 + 1e-6)
    if mask is None:
        return jnp.mean(loss)
    return jnp.mean(loss * mask) / (jnp.mean(mask) + 1e-9)


def charbonnier_ada(diff: Array, weight: Array) -> Array:
    """Weight-adaptive Charbonnier (``Charbonnier_Ada``, ``modules/losses.py:97-105``).

    alpha = w/2, eps = 10^(-(10w - 1)/3).
    """
    alpha = weight / 2.0
    epsilon = 10.0 ** (-(10.0 * weight - 1.0) / 3.0)
    return jnp.mean((diff**2 + epsilon**2) ** alpha)


def offset_fidelity_loss(
    offset: Array, flow: Array, threshold: float = 10.0
) -> Array:
    """Threshold-masked offset-vs-flow L1 (``modules/losses.py:108-125``).

    Args:
      offset: ``(B, H, W, G*K*K, 2)`` predicted sample offsets ``(dx, dy)``.
      flow: ``(B, H, W, 2)`` reference flow.
    """
    B = offset.shape[0]
    n = offset.shape[3]
    flow_rep = jnp.broadcast_to(flow[:, :, :, None, :], offset.shape)
    abs_diff = jnp.abs(offset - flow_rep)
    mask = (abs_diff > threshold).astype(abs_diff.dtype)
    # Per (batch, tap) item: mean over (H, W, 2); then sum over all items,
    # matching the reference's view(-1, 2, h, w) + mean(dim=(1,2,3)) + sum.
    masked = (mask * abs_diff).transpose(0, 3, 1, 2, 4).reshape(B * n, -1)
    return jnp.sum(jnp.mean(masked, axis=-1))
