"""Spatially-tiled HD/4K inference (SURVEY.md section 5.7).

The reference has no mechanism for frames larger than device memory; its
only aid is padding to stride multiples (``data/__init__.py:6-20``). VFI's
scale axis is spatial resolution, so this module implements the framework's
"context parallelism": overlapping spatial tiles with feathered blending.

Tiles become a batch axis, so the same 1-D data mesh that shards training
batches shards HD tiles across chips — tile-parallel inference needs no new
collectives. The overlap must cover the model's effective receptive
footprint (flow magnitude + deformable offset bound per level;
``modules/deformable_attn.py:83`` bounds residuals by offset_scale, flows
are data-dependent — 64 px default covers typical Vimeo/SNU motion).
"""

from __future__ import annotations

import math
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def make_sharded_infer(
    apply_fn: Callable,
    mesh,
    *,
    axis: int = 1,
) -> Callable:
    """Halo-exchange spatial parallelism: ONE frame sharded across the mesh.

    Instead of overlapping tiles (which recompute the overlap band —
    measured as a single-chip LOSS at 720p, BENCH_NOTES.md), the frame is
    sharded along one spatial axis and the model runs as a single GSPMD
    program: XLA inserts **halo exchanges** (``collective-permute`` of the
    1-2 boundary rows each conv window needs) for every convolution, keeps
    each device's conv compute exactly shard-sized, and turns the
    deformable sampler's source features into a KV-style ``all-gather``
    (sampling reach is data-dependent — flow + offset_scale — so the
    gather-side features are globally visible while queries stay sharded;
    this removes the flow-magnitude overlap assumption of tile mode
    entirely). Audited in ``tests/test_halo_sharding.py``: conv HLO shapes
    are shard-sized and the program contains collective-permutes, so no
    overlap pixel is ever recomputed and nothing silently replicates.

    On a 1-device mesh this degenerates to exactly the full-frame program
    (no halos, no recompute) — spatial scaling never costs single-chip
    latency, unlike tile mode's +36% overlap tax.

    This is SURVEY.md section 5.7's "context parallelism" slot done the
    TPU way: pick a mesh, annotate shardings, let XLA insert the
    collectives.

    Args:
      apply_fn: ``(params, x0, x1, t) -> pred`` model forward (params stay
        an argument — never closure-captured).
      mesh: 1-D ``jax.sharding.Mesh``; its single axis shards the spatial
        axis.
      axis: which input axis to shard — 1 (H, default) or 2 (W). Prefer
        the longer side so per-device slabs stay near-square.

    Returns:
      jitted ``sharded(params, x0, x1, t) -> (B, H, W, 3)`` with inputs
      and output sharded along ``axis``.
    """
    from jax.sharding import NamedSharding, PartitionSpec

    name = mesh.axis_names[0]
    spec = [None, None, None, None]
    spec[axis] = name
    xsh = NamedSharding(mesh, PartitionSpec(*spec))
    rep = NamedSharding(mesh, PartitionSpec())

    jitted = jax.jit(
        apply_fn, in_shardings=(rep, xsh, xsh, rep), out_shardings=xsh
    )

    def sharded(params, x0: Array, x1: Array, t: Array) -> Array:
        return jitted(
            params, jax.device_put(x0, xsh), jax.device_put(x1, xsh),
            jax.device_put(t, rep),
        )

    sharded.jitted = jitted
    sharded.input_sharding = xsh
    return sharded


def _tile_starts(size: int, tile: int, stride: int) -> list[int]:
    """Start offsets covering [0, size) with the final tile right-aligned."""
    if size <= tile:
        return [0]
    starts = list(range(0, size - tile, stride))
    starts.append(size - tile)
    return starts


def _feather_1d(
    size: int, overlap: int, trim: int, lo_interior: bool, hi_interior: bool
) -> np.ndarray:
    """Per-axis blend profile.

    Boundary edges (frame border) keep full weight; interior (cut) edges get
    ``trim`` zeroed pixels — whose values are polluted by the tile's implicit
    padding — followed by a raised-cosine ramp across the rest of the
    overlap.
    """
    w = np.ones(size, np.float32)
    ramp_len = max(overlap - trim, 1)
    ramp = 0.5 - 0.5 * np.cos(
        np.pi * (np.arange(ramp_len, dtype=np.float32) + 0.5) / ramp_len
    )
    if lo_interior:
        w[:trim] = 0.0
        w[trim:trim + ramp_len] = ramp
    if hi_interior:
        w[size - trim:] = 0.0
        w[size - trim - ramp_len:size - trim] = ramp[::-1]
    return w


def _grid(H: int, W: int, tile_hw: tuple[int, int], overlap: int):
    th, tw = tile_hw
    th, tw = min(th, H), min(tw, W)
    ys = _tile_starts(H, th, th - overlap)
    xs = _tile_starts(W, tw, tw - overlap)
    return th, tw, [(y, x) for y in ys for x in xs]


def _blend_weights(coords, th, tw, H, W, overlap):
    """Static per-tile feather masks (numpy, computed once at trace time)."""
    ov = min(overlap, th // 2, tw // 2)
    trim = ov // 4
    out = []
    for (y, x) in coords:
        wy = _feather_1d(th, ov, trim, lo_interior=y > 0,
                         hi_interior=y + th < H)
        wx = _feather_1d(tw, ov, trim, lo_interior=x > 0,
                         hi_interior=x + tw < W)
        out.append(wy[:, None] * wx[None, :])
    return np.stack(out)[..., None]  # (n, th, tw, 1)


def make_tiled_infer(
    apply_fn: Callable,
    *,
    tile_hw: tuple[int, int] = (256, 256),
    overlap: int = 64,
    tile_batch: int = 8,
    mesh=None,
) -> Callable:
    """ONE compiled program for the whole HD tile sweep.

    ``tiled_inference`` dispatches one ``infer`` call per tile chunk from
    the host — ~25 ms tunnel overhead per dispatch dominated the round-1
    720p number (BENCH_NOTES round 1: 4.36 s/pair, "incl. host tiling +
    per-chunk dispatch"). Here tiling, the ``lax.map`` over tile chunks,
    and the feathered blend are a single XLA program: one dispatch per
    frame pair, and tile chunks ride the batch axis so a data mesh still
    shards them.

    Args:
      apply_fn: ``(params, x0, x1, t) -> pred`` model forward (NOT
        pre-jitted; params stay an argument so they are not inlined as
        compile-time constants).
      mesh: optional 1-D data ``jax.sharding.Mesh`` — tiles are sharded
        across its devices and the whole sweep runs as one collective-free
        batched apply (each device computes its tile slice; the blend
        gathers at the end). Without a mesh, tile chunks of ``tile_batch``
        run sequentially under ``lax.map`` to bound single-chip memory.

    Returns:
      jitted ``tiled(params, x0, x1, t) -> (1, H, W, 3)``; recompiles per
      input shape (static tile grid).
    """

    @jax.jit
    def tiled(params, x0: Array, x1: Array, t: Array) -> Array:
        B, H, W, C = x0.shape
        assert B == 1, "tile over one frame pair at a time"
        th, tw, coords = _grid(H, W, tile_hw, overlap)
        n = len(coords)

        tiles0 = jnp.stack([x0[0, y:y + th, x:x + tw] for (y, x) in coords])
        tiles1 = jnp.stack([x1[0, y:y + th, x:x + tw] for (y, x) in coords])
        chunk = tile_batch if mesh is None else int(mesh.size)
        n_pad = (math.ceil(n / chunk) * chunk) - n
        if n_pad:
            pad_idx = np.arange(n_pad) % n  # wraps when n < n_pad
            tiles0 = jnp.concatenate([tiles0, tiles0[pad_idx]], axis=0)
            tiles1 = jnp.concatenate([tiles1, tiles1[pad_idx]], axis=0)

        if mesh is not None:
            # Tiles ride the batch axis across the mesh: one embarrassingly
            # parallel batched apply, every device holding (n+pad)/mesh.size
            # tiles (SURVEY section 5.7's spatial-parallel slot).
            from jax.sharding import NamedSharding, PartitionSpec

            sh = NamedSharding(mesh, PartitionSpec(mesh.axis_names[0]))
            tiles0 = jax.lax.with_sharding_constraint(tiles0, sh)
            tiles1 = jax.lax.with_sharding_constraint(tiles1, sh)
            tb = jnp.broadcast_to(t, (n + n_pad, 1, 1, 1))
            preds = apply_fn(params, tiles0, tiles1, tb)[:n]
        else:
            nc = (n + n_pad) // tile_batch
            tiles0 = tiles0.reshape(nc, tile_batch, th, tw, C)
            tiles1 = tiles1.reshape(nc, tile_batch, th, tw, C)
            tb = jnp.broadcast_to(t, (tile_batch, 1, 1, 1))

            preds = jax.lax.map(
                lambda pair: apply_fn(params, pair[0], pair[1], tb),
                (tiles0, tiles1),
            )
            preds = preds.reshape(nc * tile_batch, th, tw, C)[:n]

        weights = jnp.asarray(
            _blend_weights(coords, th, tw, H, W, overlap), preds.dtype)
        acc = jnp.zeros((H, W, C), preds.dtype)
        norm = jnp.zeros((H, W, 1), preds.dtype)
        for k, (y, x) in enumerate(coords):
            acc = jax.lax.dynamic_update_slice(
                acc,
                jax.lax.dynamic_slice(acc, (y, x, 0), (th, tw, C))
                + preds[k] * weights[k],
                (y, x, 0),
            )
            norm = jax.lax.dynamic_update_slice(
                norm,
                jax.lax.dynamic_slice(norm, (y, x, 0), (th, tw, 1))
                + weights[k],
                (y, x, 0),
            )
        return (acc / norm)[None]

    return tiled


def tiled_inference(
    infer: Callable,
    x0: Array,
    x1: Array,
    t: Array,
    *,
    tile_hw: tuple[int, int] = (256, 256),
    overlap: int = 64,
    tile_batch: int = 8,
) -> Array:
    """Run ``infer`` over overlapping spatial tiles and feather-blend.

    Args:
      infer: jitted ``(x0, x1, t) -> pred`` on NHWC batches; tiles are fed
        in batches of ``tile_batch`` so a data-parallel mesh shards them.
      x0, x1: ``(1, H, W, 3)`` frames (H, W arbitrary; tiles are padded to
        the model's stride internally by the caller if needed).
      t: ``(1, 1, 1, 1)``.
      tile_hw: tile size (multiple of the model stride, 16).
      overlap: per-edge overlap in pixels (also the blend feather width).

    Returns:
      ``(1, H, W, 3)`` blended prediction.
    """
    B, H, W, C = x0.shape
    assert B == 1, "tile over one frame pair at a time"
    th, tw = tile_hw
    th, tw = min(th, H), min(tw, W)
    stride_h, stride_w = th - overlap, tw - overlap

    ys = _tile_starts(H, th, stride_h)
    xs = _tile_starts(W, tw, stride_w)

    coords = [(y, x) for y in ys for x in xs]
    n = len(coords)

    tiles0 = jnp.stack(
        [jax.lax.dynamic_slice(x0[0], (y, x, 0), (th, tw, C))
         for (y, x) in coords]
    )
    tiles1 = jnp.stack(
        [jax.lax.dynamic_slice(x1[0], (y, x, 0), (th, tw, C))
         for (y, x) in coords]
    )

    # Pad the tile batch to a multiple of tile_batch and run in chunks.
    n_pad = (math.ceil(n / tile_batch) * tile_batch) - n
    if n_pad:
        pad_idx = np.arange(n_pad) % n  # wraps when n < n_pad
        tiles0 = jnp.concatenate([tiles0, tiles0[pad_idx]], axis=0)
        tiles1 = jnp.concatenate([tiles1, tiles1[pad_idx]], axis=0)
    tb = jnp.broadcast_to(t, (tile_batch, 1, 1, 1))

    preds = []
    for i in range(0, n + n_pad, tile_batch):
        preds.append(infer(tiles0[i:i + tile_batch],
                           tiles1[i:i + tile_batch], tb))
    preds = jnp.concatenate(preds, axis=0)[:n]

    ov = min(overlap, th // 2, tw // 2)
    trim = ov // 4

    acc = jnp.zeros((H, W, C), preds.dtype)
    norm = jnp.zeros((H, W, 1), preds.dtype)
    for k, (y, x) in enumerate(coords):
        wy = _feather_1d(th, ov, trim, lo_interior=y > 0,
                         hi_interior=y + th < H)
        wx = _feather_1d(tw, ov, trim, lo_interior=x > 0,
                         hi_interior=x + tw < W)
        weight = jnp.asarray(wy[:, None] * wx[None, :], preds.dtype)[..., None]
        acc = jax.lax.dynamic_update_slice(
            acc,
            jax.lax.dynamic_slice(acc, (y, x, 0), (th, tw, C))
            + preds[k] * weight,
            (y, x, 0),
        )
        norm = jax.lax.dynamic_update_slice(
            norm,
            jax.lax.dynamic_slice(norm, (y, x, 0), (th, tw, 1)) + weight,
            (y, x, 0),
        )
    return (acc / norm)[None]
