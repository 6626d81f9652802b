"""PSNR / SSIM with the reference's exact semantics (``evaluate.py:16-85``).

PSNR: ``-10 * log10(mse)`` over all pixels/channels of one image pair.

SSIM: the reference's unusual 3-D formulation — an 11x11x11 separable
gaussian window convolved over (C, H, W) treated as three spatial dims of a
single-channel 5-D volume, with replicate padding 5 on every axis
(``evaluate.py:21-80``). Reproduced exactly so reported numbers are
comparable.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def psnr(img1: Array, img2: Array) -> Array:
    """``calculate_psnr`` (``evaluate.py:83-85``); images in [0, 1]."""
    mse = jnp.mean((img1.astype(jnp.float32) - img2.astype(jnp.float32)) ** 2)
    return -10.0 * jnp.log10(mse)


@functools.lru_cache(maxsize=4)
def _window_3d(window_size: int, sigma: float = 1.5) -> np.ndarray:
    g = np.array(
        [
            math.exp(-((x - window_size // 2) ** 2) / (2.0 * sigma**2))
            for x in range(window_size)
        ],
        np.float64,
    )
    g = g / g.sum()
    w1 = g[:, None]
    w2 = w1 @ w1.T
    # reference: _2D_window.unsqueeze(2) @ _1D_window.t() -> (ws, ws, ws)
    w3 = w2[:, :, None] * g[None, None, :]
    return w3.astype(np.float32)


def _conv3d_replicate(vol: Array, window: Array) -> Array:
    """5-D single-channel conv with replicate padding 5 on (D, H, W).

    vol: ``(B, 1, D, H, W)``; window: ``(ws, ws, ws)``.
    """
    ws = window.shape[0]
    pad = ws // 2
    vol = jnp.pad(
        vol,
        ((0, 0), (0, 0), (pad, pad), (pad, pad), (pad, pad)),
        mode="edge",
    )
    kernel = window[None, None]  # (O=1, I=1, D, H, W)
    return jax.lax.conv_general_dilated(
        vol,
        kernel,
        window_strides=(1, 1, 1),
        padding="VALID",
        dimension_numbers=("NCDHW", "OIDHW", "NCDHW"),
    )


def ssim_3d(
    img1: Array,
    img2: Array,
    window_size: int = 11,
    val_range: float | None = None,
) -> Array:
    """``calculate_ssim`` (``evaluate.py:29-80``) on NHWC images.

    Args:
      img1, img2: ``(B, H, W, C)``.
    """
    img1 = img1.astype(jnp.float32)
    img2 = img2.astype(jnp.float32)
    if val_range is None:
        max_val = jnp.where(jnp.max(img1) > 128.0, 255.0, 1.0)
        min_val = jnp.where(jnp.min(img1) < -0.5, -1.0, 0.0)
        L = max_val - min_val
    else:
        L = jnp.asarray(val_range, jnp.float32)

    # NHWC -> (B, 1, C, H, W): channels become the leading spatial dim.
    v1 = img1.transpose(0, 3, 1, 2)[:, None]
    v2 = img2.transpose(0, 3, 1, 2)[:, None]

    window = jnp.asarray(_window_3d(window_size))

    mu1 = _conv3d_replicate(v1, window)
    mu2 = _conv3d_replicate(v2, window)
    mu1_sq, mu2_sq, mu1_mu2 = mu1**2, mu2**2, mu1 * mu2

    sigma1_sq = _conv3d_replicate(v1 * v1, window) - mu1_sq
    sigma2_sq = _conv3d_replicate(v2 * v2, window) - mu2_sq
    sigma12 = _conv3d_replicate(v1 * v2, window) - mu1_mu2

    C1 = (0.01 * L) ** 2
    C2 = (0.03 * L) ** 2
    v1_ = 2.0 * sigma12 + C2
    v2_ = sigma1_sq + sigma2_sq + C2
    ssim_map = ((2.0 * mu1_mu2 + C1) * v1_) / ((mu1_sq + mu2_sq + C1) * v2_)
    return jnp.mean(ssim_map)
