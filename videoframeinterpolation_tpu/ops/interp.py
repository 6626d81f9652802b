"""Bilinear sampling / resizing primitives (the framework's kernel substrate).

These are the TPU-native equivalents of the reference's three native sampling
kernels (SURVEY.md section 2.6):

  * ``grid_sample``  <-  ``torch.nn.functional.grid_sample`` (ATen CUDA), used
    by backward warping (reference ``modules/warp.py:14``) and by deformable
    attention sampling (reference ``modules/deformable_attn.py:99``).
  * ``resize_bilinear``  <-  ``torch.nn.functional.interpolate`` with
    ``mode="bilinear"`` (reference ``models/BaseModel.py:19-22`` uses
    ``align_corners=True``; the archived IFRNet uses ``align_corners=False``,
    ``models/archive/IFRNet.py:6-8``).

Design notes (TPU):
  * Everything is NHWC. The four bilinear taps are four batched gathers over a
    flattened ``H*W`` axis — XLA lowers ``take_along_axis`` to a dynamic-gather
    that keeps the channel axis contiguous in lanes.
  * ``resize_bilinear`` is expressed as two small dense matmuls (separable 1-D
    interpolation matrices) instead of a gather so it rides the MXU; the
    matrices are shape-static and get constant-folded by XLA inside ``jit``.
  * Coordinates follow ``align_corners=True`` semantics: pixel ``i`` lives at
    coordinate ``i`` in ``[0, size-1]`` (the only convention the reference
    uses for sampling).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

Array = jax.Array


def _gather_hw(img_flat: Array, idx: Array) -> Array:
    """Gather pixels from a flattened image.

    Args:
      img_flat: ``(B, H*W, C)``.
      idx: ``(B, N)`` int32 flat pixel indices.

    Returns:
      ``(B, N, C)``.
    """
    return jnp.take_along_axis(img_flat, idx[..., None], axis=1)


def build_quad_table(img: Array, padding_mode: str = "border") -> Array:
    """Pack each pixel's 2x2 bilinear neighborhood into one row.

    TPU XLA gathers cost ~constant time per ROW regardless of row width
    (measured ~14 ns/row on v5e whether rows carry 9 or 72 channels), so
    bilinear sampling is 4x faster when all four taps live in one gathered
    row. The table covers base positions ``(y0, x0)`` in
    ``[-1, H-1] x [-1, W-1]`` (shifted by +1), padded with edge values
    (border mode) or zeros.

    Returns ``(B, (H+2)*(W+2) rows are NOT materialized; shape is
    (B, H+1, W+1, 4*C))`` with channel blocks ``[v00 | v01 | v10 | v11]``.
    """
    B, H, W, C = img.shape
    mode = "edge" if padding_mode == "border" else "constant"
    p = jnp.pad(img, ((0, 0), (1, 1), (1, 1), (0, 0)), mode=mode)
    # quad[i, j] corresponds to base (y0, x0) = (i-1, j-1).
    v00 = p[:, 0:H + 1, 0:W + 1]
    v01 = p[:, 0:H + 1, 1:W + 2]
    v10 = p[:, 1:H + 2, 0:W + 1]
    v11 = p[:, 1:H + 2, 1:W + 2]
    return jnp.concatenate([v00, v01, v10, v11], axis=-1)


def grid_sample(
    img: Array,
    coords: Array,
    *,
    padding_mode: str = "border",
    quad: Array | None = None,
) -> Array:
    """Bilinear sampling at fractional pixel coordinates.

    Equivalent to ``F.grid_sample(img, grid, mode='bilinear',
    padding_mode=padding_mode, align_corners=True)`` with the grid already
    mapped from [-1, 1] to pixel units (reference ``modules/warp.py:7-15``
    performs exactly that mapping before calling grid_sample).

    Implementation: ONE row-gather per sample from a packed 2x2-quad table
    (see :func:`build_quad_table`) instead of four tap-gathers — the
    TPU-native formulation (gathers are per-row-cost-bound).

    Args:
      img: ``(B, H, W, C)``.
      coords: ``(B, ..., 2)`` with last dim ``(x, y)`` in pixel units
        (``x`` in ``[0, W-1]``, ``y`` in ``[0, H-1]`` for in-bounds samples).
      padding_mode: ``"border"`` (clamp, used by bwarp) or ``"zeros"``
        (out-of-bounds taps contribute 0, used by deformable attention /
        deformable convolution).
      quad: optional precomputed quad table (reuse across many sample sets
        of the same image).

    Returns:
      ``(B, ..., C)`` sampled values, same leading shape as ``coords``.
    """
    if padding_mode not in ("border", "zeros"):
        raise ValueError(f"unsupported padding_mode: {padding_mode}")
    B, H, W, C = img.shape
    lead = coords.shape[:-1]
    coords = coords.reshape(B, -1, 2)

    x = coords[..., 0].astype(jnp.float32)
    y = coords[..., 1].astype(jnp.float32)

    if padding_mode == "border":
        # Border semantics == clamping the continuous coordinate first
        # (identical results to torch's per-tap index clamping).
        x = jnp.clip(x, 0.0, W - 1)
        y = jnp.clip(y, 0.0, H - 1)

    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    wx = x - x0f
    wy = y - y0f
    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)

    if padding_mode == "zeros":
        # Per-tap validity from the raw tap coordinates (torch semantics).
        def inb(xi, yi):
            return (
                (xi >= 0) & (xi <= W - 1) & (yi >= 0) & (yi <= H - 1)
            ).astype(img.dtype)

        m00 = inb(x0, y0)[..., None]
        m01 = inb(x0 + 1, y0)[..., None]
        m10 = inb(x0, y0 + 1)[..., None]
        m11 = inb(x0 + 1, y0 + 1)[..., None]

    # Base indices into the (H+1, W+1) quad table (+1 shift; clamp keeps
    # far-out-of-bounds zeros-mode rows valid — their masks zero them).
    xq = jnp.clip(x0 + 1, 0, W)
    yq = jnp.clip(y0 + 1, 0, H)

    if quad is None:
        quad = build_quad_table(img, padding_mode)
    qflat = quad.reshape(B, (H + 1) * (W + 1), 4 * C)
    idx = yq * (W + 1) + xq
    # Chunked gather: monolithic multi-M-row gathers run at ~13 ns/row on
    # v5e while calls bounded in rows AND operand bytes run at ~8 ns/row
    # (operand stays cache-resident). Split both the batch axis (operand
    # slices <= ~16 MB) and the row axis (<= ~256K rows/call).
    N = idx.shape[1]
    table_bytes = qflat.shape[1] * qflat.shape[2] * qflat.dtype.itemsize
    B_CHUNK = max(1, (16 << 20) // max(table_bytes, 1))
    CHUNK = max(8192, 262144 // min(B, B_CHUNK))

    def gather_all(qf, ix):
        n = ix.shape[1]
        if n <= CHUNK:
            return _gather_hw(qf, ix)
        return jnp.concatenate(
            [_gather_hw(qf, ix[:, i * CHUNK:(i + 1) * CHUNK])
             for i in range(-(-n // CHUNK))], axis=1)

    if B > B_CHUNK:
        rows = jnp.concatenate(
            [gather_all(qflat[i:i + B_CHUNK], idx[i:i + B_CHUNK])
             for i in range(0, B, B_CHUNK)], axis=0)
    else:
        rows = gather_all(qflat, idx)  # (B, N, 4C)
    v00 = rows[..., 0 * C:1 * C]
    v01 = rows[..., 1 * C:2 * C]
    v10 = rows[..., 2 * C:3 * C]
    v11 = rows[..., 3 * C:4 * C]

    wx = wx[..., None].astype(img.dtype)
    wy = wy[..., None].astype(img.dtype)
    w00 = (1.0 - wx) * (1.0 - wy)
    w01 = wx * (1.0 - wy)
    w10 = (1.0 - wx) * wy
    w11 = wx * wy

    if padding_mode == "zeros":
        w00 = w00 * m00
        w01 = w01 * m01
        w10 = w10 * m10
        w11 = w11 * m11

    out = w00 * v00 + w01 * v01 + w10 * v10 + w11 * v11
    return out.reshape(B, *lead[1:], C)


def normalized_grid_sample(
    img: Array, grid: Array, *, padding_mode: str = "border"
) -> Array:
    """grid_sample with a torch-style normalized [-1, 1] grid.

    ``grid`` has last dim ``(gx, gy)`` in [-1, 1] with ``align_corners=True``
    mapping: ``x_pix = (gx + 1) / 2 * (W - 1)``.
    """
    _, H, W, _ = img.shape
    x = (grid[..., 0] + 1.0) * 0.5 * (W - 1)
    y = (grid[..., 1] + 1.0) * 0.5 * (H - 1)
    return grid_sample(img, jnp.stack([x, y], axis=-1), padding_mode=padding_mode)


@functools.lru_cache(maxsize=64)
def _interp_weights(in_size: int, out_size: int, align_corners: bool):
    """Static (out_size, in_size) 1-D linear-interpolation matrix (as numpy)."""
    import numpy as np

    if out_size == 1:
        src = np.zeros((1,), np.float64)
    elif align_corners:
        src = np.arange(out_size, dtype=np.float64) * (in_size - 1) / (out_size - 1)
    else:
        scale = in_size / out_size
        src = (np.arange(out_size, dtype=np.float64) + 0.5) * scale - 0.5
        src = np.clip(src, 0.0, in_size - 1)
    lo = np.floor(src).astype(np.int64)
    lo = np.clip(lo, 0, in_size - 1)
    hi = np.minimum(lo + 1, in_size - 1)
    w_hi = src - lo
    mat = np.zeros((out_size, in_size), np.float32)
    rows = np.arange(out_size)
    mat[rows, lo] += 1.0 - w_hi
    mat[rows, hi] += w_hi
    return mat


def resize_bilinear(
    x: Array, out_hw: tuple[int, int], *, align_corners: bool = True
) -> Array:
    """Bilinear resize via two separable interpolation matmuls (MXU path).

    Matches ``F.interpolate(x, mode='bilinear', align_corners=...)``
    (reference ``models/BaseModel.py:19-22``). Shapes are static under jit so
    the interpolation matrices are compile-time constants.

    Args:
      x: ``(B, H, W, C)``.
      out_hw: target ``(H_out, W_out)``.
    """
    B, H, W, C = x.shape
    Ho, Wo = out_hw
    if (Ho, Wo) == (H, W):
        return x
    mh = jnp.asarray(_interp_weights(H, Ho, align_corners), x.dtype)
    mw = jnp.asarray(_interp_weights(W, Wo, align_corners), x.dtype)
    # (B, H, W, C) -> (B, Ho, W, C)
    x = jnp.einsum("oh,bhwc->bowc", mh, x)
    # -> (B, Ho, Wo, C)
    x = jnp.einsum("ow,bhwc->bhoc", mw, x)
    return x


def scale_resize(x: Array, scale_factor: float, *, align_corners: bool = True) -> Array:
    """``BaseModel.resize`` semantics: scale spatial dims by ``scale_factor``.

    Flow *values* are NOT rescaled (the reference's DAT model upsamples flow
    maps spatially without multiplying magnitudes, ``models/DAT.py:96-105``;
    callers that want IFRNet's ``2.0 * resize(flow, 2.0)`` do the multiply
    themselves, ``models/archive/IFRNet.py:211-212``).
    """
    B, H, W, C = x.shape
    out_hw = (int(H * scale_factor), int(W * scale_factor))
    return resize_bilinear(x, out_hw, align_corners=align_corners)
