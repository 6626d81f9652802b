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
import warnings
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

# Max full-resolution displacement of the flagship's deformable sampler
# beyond its predicted flow: tanh-bounded residuals scaled by offset_scale
# (2/4/8 at levels of stride 8/4/2, models/dat.py:107-127) — 16 px at
# every level. The reference bounds residuals the same way
# (modules/deformable_attn.py:83-86) but never validates tile overlap
# against it (it has no tiling at all).
FLAGSHIP_OFFSET_REACH_PX = 16.0


def estimate_flow_magnitude(
    apply_fn: Callable,
    params,
    x0: Array,
    x1: Array,
    t: Array,
    *,
    downscale: int = 4,
    safety: float = 1.25,
) -> float:
    """Estimate the max full-res flow magnitude (px) for one frame pair.

    Runs the model ``train=True`` on a ``downscale``-reduced copy of the
    frames (~1/downscale**2 the cost) and reads its own predicted flow
    pyramids. Pyramid magnitudes are stored in each level's pixel units
    (models/dat.py docstring), so full-res magnitude = level value x level
    stride x downscale. ``safety`` inflates the estimate to cover the
    low-res pass underestimating thin fast movers.

    Raises TypeError/KeyError if ``apply_fn`` does not expose flow
    pyramids (non-flagship models) — callers fall back to a default.
    """
    B, H, W, _ = x0.shape
    hh = max(32, int(round(H / downscale / 16)) * 16)
    ww = max(32, int(round(W / downscale / 16)) * 16)
    x0s = jax.image.resize(x0, (B, hh, ww, 3), "linear")
    x1s = jax.image.resize(x1, (B, hh, ww, 3), "linear")
    _, inter = apply_fn(params, x0s, x1s, t, train=True)
    # Level strides for the pyramid lists [lv1, lv2, lv3, lv4].
    strides = (2.0, 4.0, 8.0, 16.0)
    mags = []
    for key in ("pred_ft0", "pred_ft1"):
        for flow, s in zip(inter[key], strides):
            mags.append(float(jnp.max(jnp.abs(flow))) * s)
    # Downsampled-frame motion is 1/downscale of the original's.
    return max(mags) * downscale * safety


def required_overlap(
    flow_mag_px: float,
    *,
    offset_reach_px: float = FLAGSHIP_OFFSET_REACH_PX,
    feather_px: int = 16,
    quantize: int = 16,
) -> tuple[int, int]:
    """(overlap, trim) in px that make tiled inference seam-safe.

    A pixel at distance d from a tile's interior (cut) edge samples up to
    ``flow + offset_reach`` px past the edge, where the tile sees implicit
    padding instead of the true frame. The blend must therefore give ZERO
    weight to pixels with d < reach (``trim``) and ramp across a further
    ``feather_px``. Every pixel also needs SOME tile where its weight is
    nonzero — tiles advance by ``tile - overlap`` and each keeps an
    interval of length ``tile - 2*trim``, so the overlap must be at least
    ``2*trim``. Hence ``overlap = max(trim + feather, 2*trim)`` rounded up
    to the model stride (16). The 64-px default overlap with its ov//4
    trim is only seam-safe up to ~0 px flow; this function is the
    data-driven replacement (VERDICT round 2, gap #3).

    Both trim AND overlap are quantized UP to a multiple of ``quantize``
    (default 16): the continuous per-pair flow estimate would otherwise
    mint a distinct (overlap, trim) plan — and a fresh 3-5 min remote
    compile — for nearly every HD pair (ADVICE round 3 #1).
    """
    q = max(1, quantize)
    trim = int(math.ceil((flow_mag_px + offset_reach_px) / q)) * q
    overlap = int(math.ceil(max(trim + feather_px, 2 * trim) / 16.0)) * 16
    return overlap, trim


def make_flow_probe(
    train_apply_fn: Callable,
    *,
    downscale: int = 4,
    safety: float = 1.25,
) -> Callable:
    """Jitted ``probe(params, x0, x1, t) -> float`` max-flow estimate (px).

    One compiled program (resize + train-mode forward + pyramid max) and
    ONE scalar fetch per pair — the eager per-op dispatch of
    ``estimate_flow_magnitude`` costs ~25 ms per op on the tunneled
    backend (ADVICE round 3 #4). Recompiles per input shape; HD eval
    shapes are constant per dataset so the jit cache holds one entry.
    """

    @jax.jit
    def _mag(params, x0: Array, x1: Array, t: Array) -> Array:
        B, H, W, _ = x0.shape
        hh = max(32, int(round(H / downscale / 16)) * 16)
        ww = max(32, int(round(W / downscale / 16)) * 16)
        x0s = jax.image.resize(x0, (B, hh, ww, 3), "linear")
        x1s = jax.image.resize(x1, (B, hh, ww, 3), "linear")
        _, inter = train_apply_fn(params, x0s, x1s, t, train=True)
        strides = (2.0, 4.0, 8.0, 16.0)
        mags = [jnp.max(jnp.abs(flow)) * s
                for key in ("pred_ft0", "pred_ft1")
                for flow, s in zip(inter[key], strides)]
        return jnp.max(jnp.stack(mags))

    def probe(params, x0: Array, x1: Array, t: Array) -> float:
        return float(_mag(params, x0, x1, t)) * downscale * safety

    return probe


def check_overlap(
    overlap: int, trim: Optional[int], flow_mag_px: float, tile: int,
    *, offset_reach_px: float = FLAGSHIP_OFFSET_REACH_PX,
) -> None:
    """Warn when a tiling plan cannot be seam-free for the given motion."""
    reach = flow_mag_px + offset_reach_px
    eff_trim = (overlap // 4) if trim is None else trim
    if eff_trim < reach:
        warnings.warn(
            f"tile overlap {overlap} (trim {eff_trim}) < sampling reach "
            f"{reach:.0f} px (flow {flow_mag_px:.0f} + offsets "
            f"{offset_reach_px:.0f}); seams possible — grow --tile overlap "
            f"or use halo sharding (make_sharded_infer)", stacklevel=2)
    if overlap >= tile // 2:
        warnings.warn(
            f"overlap {overlap} >= tile/2 ({tile // 2}): tiles mostly "
            f"recompute each other; use a larger tile", stacklevel=2)


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


def make_flow_aware_tiled(
    apply_fn: Callable,
    params,
    tile: int,
    *,
    train_apply_fn: Optional[Callable] = None,
    default_flow_px: float = 32.0,
    tile_batch: int = 8,
    mesh=None,
    verbose: bool = True,
    unsafe_plan: str = "full",
) -> Callable:
    """``infer(x0, x1, t) -> pred`` with per-pair flow-sized tile overlap.

    Frames no larger than ``tile`` (or batched inputs) run full-frame; HD
    singles are tiled with overlap/trim computed from the pair's own
    estimated motion (a jitted ``make_flow_probe`` over ``train_apply_fn``,
    the model's ``train=True`` flow pyramids) plus the sampler's offset
    reach — replacing the fixed 64 px overlap that silently seams on large
    motion (VERDICT round-2 gap #3). Both overlap and trim are quantized
    to 16 px (``required_overlap``) so the compiled-sweep cache stays
    small (<= tile/32 distinct plans).

    Failure modes are LOUD, never silent (VERDICT round-3 #5):

    - A probe that raises TypeError/KeyError (model without flow pyramids)
      warns once and falls back to ``default_flow_px``; any other
      exception (e.g. a backend failure) propagates.
    - When the required overlap exceeds ``tile // 2`` the tile cannot hold
      the sampling reach: with ``unsafe_plan="full"`` (default) the pair
      runs FULL-FRAME (seam-free by construction, may cost memory) with a
      warning; ``unsafe_plan="raise"`` raises a ValueError naming
      ``make_sharded_infer`` as the memory-safe alternative. A clamped,
      known-seam-unsafe plan is never silently executed.

    Args:
      apply_fn: ``(params, x0, x1, t) -> pred``.
      train_apply_fn: ``(params, x0, x1, t, train=True) -> (pred, inter)``
        exposing flow pyramids; None (or a model without them) falls back
        to ``default_flow_px``.
      unsafe_plan: ``"full"`` or ``"raise"`` — policy when the estimated
        motion cannot be made seam-safe at this tile size.
    """
    if unsafe_plan not in ("full", "raise"):
        raise ValueError(f"unsafe_plan must be 'full' or 'raise', "
                         f"got {unsafe_plan!r}")
    full = jax.jit(apply_fn)
    cache: dict = {}
    probe = make_flow_probe(train_apply_fn) if train_apply_fn else None

    def infer(x0: Array, x1: Array, t: Array) -> Array:
        H, W = x0.shape[1:3]
        if max(H, W) <= tile or x0.shape[0] != 1:
            return full(params, x0, x1, t)
        plan = _plan_tiles(probe, params, x0, x1, t, tile,
                           default_flow_px=default_flow_px,
                           unsafe_plan=unsafe_plan)
        if plan is None:
            return full(params, x0, x1, t)
        if plan not in cache:
            overlap, trim = plan
            if verbose:
                print(f"tiling plan: tile {tile}, overlap {overlap}, "
                      f"trim {trim}")
            cache[plan] = make_tiled_infer(
                apply_fn, tile_hw=(tile, tile), overlap=overlap,
                trim=trim, tile_batch=tile_batch, mesh=mesh)
        return cache[plan](params, x0, x1, t)

    return infer


def _plan_tiles(
    probe: Optional[Callable],
    params,
    x0: Array,
    x1: Array,
    t: Array,
    tile: int,
    *,
    default_flow_px: float,
    unsafe_plan: str,
    mag_scale: float = 1.0,
) -> Optional[tuple[int, int]]:
    """Pick a seam-safe ``(overlap, trim)`` for one pair, or None = full-frame.

    Shared by the single-instant and multi-instant flow-aware paths; the
    loud failure-mode policy (VERDICT round-3 #5) lives here. ``mag_scale``
    inflates the probed t=0.5 flow magnitude — the multi-instant path uses
    it because instants near 0 or 1 sample up to the FULL pair motion,
    roughly twice the t=0.5 reading.
    """
    mag = default_flow_px
    if probe is not None:
        try:
            mag = probe(params, x0, x1, t)
        except (TypeError, KeyError) as e:
            warnings.warn(
                f"flow probe unavailable ({type(e).__name__}: {e}); "
                f"falling back to default_flow_px={default_flow_px} — "
                f"motion beyond that may seam", stacklevel=3)
    mag = mag * mag_scale
    overlap, trim = required_overlap(mag)
    if overlap > tile // 2:
        # The tile cannot contain the sampling reach; a clamped plan
        # WOULD seam. Never run it (VERDICT round-3 #5).
        if unsafe_plan == "raise":
            raise ValueError(
                f"estimated motion {mag:.0f}px needs overlap {overlap} "
                f"> tile/2 ({tile // 2}); use a larger --tile, or "
                f"halo sharding (make_sharded_infer) which has no "
                f"overlap assumption")
        warnings.warn(
            f"estimated motion {mag:.0f}px needs overlap {overlap} > "
            f"tile/2 ({tile // 2}); running FULL-FRAME for this pair "
            f"(seam-free; if it OOMs, use make_sharded_infer)",
            stacklevel=3)
        return None
    check_overlap(overlap, trim, mag, tile)
    return overlap, trim


def make_flow_aware_multi_t(
    multi_apply_fn: Callable,
    params,
    tile: int,
    ts: tuple,
    *,
    train_apply_fn: Optional[Callable] = None,
    default_flow_px: float = 32.0,
    tile_batch: int = 8,
    mesh=None,
    verbose: bool = True,
    unsafe_plan: str = "full",
) -> Callable:
    """``infer(x0, x1) -> (T, 1, H, W, 3)`` — flow-aware tiled multi-instant.

    The multi-instant analogue of ``make_flow_aware_tiled`` for sequence
    upsampling on HD/4K frames (``interpolate.py --mode direct --tile``):
    every intermediate instant of a pair is decoded inside each tile's
    single traced program (encoder shared via the staged encode/decode
    API), and tiles are planned per pair from the probed motion. The probe
    runs at t=0.5, whose flow pyramids read about HALF the pair's total
    motion; instants near 0 or 1 sample up to the full pair motion, so the
    plan inflates the estimate by ``2 * max(max(ts), 1 - min(ts))``.

    Args:
      multi_apply_fn: ``(params, x0, x1) -> (T, B, H, W, 3)`` — e.g.
        ``lambda p, a, b: multi_t_apply(model, p, a, b, ts)``.
      ts: the static instants baked into ``multi_apply_fn`` (used only for
        the seam-safety scale factor).
      Other args as in ``make_flow_aware_tiled``.
    """
    if unsafe_plan not in ("full", "raise"):
        raise ValueError(f"unsafe_plan must be 'full' or 'raise', "
                         f"got {unsafe_plan!r}")
    full = jax.jit(multi_apply_fn)
    cache: dict = {}
    probe = make_flow_probe(train_apply_fn) if train_apply_fn else None
    mag_scale = 2.0 * max(max(ts), 1.0 - min(ts)) if ts else 1.0

    def infer(x0: Array, x1: Array) -> Array:
        H, W = x0.shape[1:3]
        if max(H, W) <= tile or x0.shape[0] != 1:
            return full(params, x0, x1)
        t05 = jnp.full((x0.shape[0], 1, 1, 1), 0.5, jnp.float32)
        plan = _plan_tiles(probe, params, x0, x1, t05, tile,
                           default_flow_px=default_flow_px,
                           unsafe_plan=unsafe_plan, mag_scale=mag_scale)
        if plan is None:
            return full(params, x0, x1)
        if plan not in cache:
            overlap, trim = plan
            if verbose:
                print(f"tiling plan (multi-t x{len(ts)}): tile {tile}, "
                      f"overlap {overlap}, trim {trim}")
            cache[plan] = make_tiled_multi_t(
                multi_apply_fn, tile_hw=(tile, tile), overlap=overlap,
                trim=trim, tile_batch=tile_batch, mesh=mesh)
        return cache[plan](params, x0, x1)

    return infer


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


def _blend_weights(coords, th, tw, H, W, overlap, trim=None):
    """Static per-tile feather masks (numpy, computed once at trace time).

    ``trim`` is the zero-weight band at interior (cut) edges — pixels whose
    sampling reach crosses the tile border (see ``required_overlap``).
    Default: ov//4 (the pre-flow-aware heuristic). Clamped to ov//2: a
    larger trim would leave pixels no tile with nonzero blend weight.
    """
    ov = min(overlap, th // 2, tw // 2)
    trim = ov // 4 if trim is None else max(0, min(trim, ov // 2))
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
    trim: Optional[int] = None,
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
            _blend_weights(coords, th, tw, H, W, overlap, trim), preds.dtype)
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


def make_tiled_multi_t(
    multi_apply_fn: Callable,
    *,
    tile_hw: tuple[int, int] = (256, 256),
    overlap: int = 64,
    trim: Optional[int] = None,
    tile_batch: int = 8,
    mesh=None,
) -> Callable:
    """Multi-instant tile sweep: ONE compiled program, encoder shared.

    Like ``make_tiled_infer`` but the per-tile apply decodes EVERY
    interpolation instant of the pair (``multi_apply_fn`` wraps
    ``multi_t_apply`` over a staged encode/decode model), so factor-N
    sequence upsampling of HD frames pays one encoder pyramid per tile —
    not one per (tile, instant) — and one device dispatch per pair.

    Args:
      multi_apply_fn: ``(params, x0, x1) -> (T, B, H, W, C)``.
      Other args as in ``make_tiled_infer``.

    Returns:
      jitted ``tiled(params, x0, x1) -> (T, 1, H, W, C)``.
    """

    @jax.jit
    def tiled(params, x0: Array, x1: Array) -> Array:
        B, H, W, C = x0.shape
        assert B == 1, "tile over one frame pair at a time"
        th, tw, coords = _grid(H, W, tile_hw, overlap)
        n = len(coords)

        tiles0 = jnp.stack([x0[0, y:y + th, x:x + tw] for (y, x) in coords])
        tiles1 = jnp.stack([x1[0, y:y + th, x:x + tw] for (y, x) in coords])
        chunk = tile_batch if mesh is None else int(mesh.size)
        n_pad = (math.ceil(n / chunk) * chunk) - n
        if n_pad:
            pad_idx = np.arange(n_pad) % n
            tiles0 = jnp.concatenate([tiles0, tiles0[pad_idx]], axis=0)
            tiles1 = jnp.concatenate([tiles1, tiles1[pad_idx]], axis=0)

        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            sh = NamedSharding(mesh, PartitionSpec(None, mesh.axis_names[0]))
            tsh = NamedSharding(mesh, PartitionSpec(mesh.axis_names[0]))
            tiles0 = jax.lax.with_sharding_constraint(tiles0, tsh)
            tiles1 = jax.lax.with_sharding_constraint(tiles1, tsh)
            preds = multi_apply_fn(params, tiles0, tiles1)  # (T, n+pad, ...)
            preds = jax.lax.with_sharding_constraint(preds, sh)[:, :n]
        else:
            nc = (n + n_pad) // tile_batch
            tiles0 = tiles0.reshape(nc, tile_batch, th, tw, C)
            tiles1 = tiles1.reshape(nc, tile_batch, th, tw, C)
            preds = jax.lax.map(
                lambda pair: multi_apply_fn(params, pair[0], pair[1]),
                (tiles0, tiles1),
            )  # (nc, T, tile_batch, th, tw, C)
            T = preds.shape[1]
            preds = jnp.moveaxis(preds, 1, 0).reshape(
                T, nc * tile_batch, th, tw, C)[:, :n]

        T = preds.shape[0]
        weights = jnp.asarray(
            _blend_weights(coords, th, tw, H, W, overlap, trim), preds.dtype)
        acc = jnp.zeros((T, H, W, C), preds.dtype)
        norm = jnp.zeros((H, W, 1), preds.dtype)
        for k, (y, x) in enumerate(coords):
            acc = jax.lax.dynamic_update_slice(
                acc,
                jax.lax.dynamic_slice(acc, (0, y, x, 0), (T, th, tw, C))
                + preds[:, k] * weights[k],
                (0, y, x, 0),
            )
            norm = jax.lax.dynamic_update_slice(
                norm,
                jax.lax.dynamic_slice(norm, (y, x, 0), (th, tw, 1))
                + weights[k],
                (y, x, 0),
            )
        return (acc / norm)[:, None]

    return tiled


def tiled_inference(
    infer: Callable,
    x0: Array,
    x1: Array,
    t: Array,
    *,
    tile_hw: tuple[int, int] = (256, 256),
    overlap: int = 64,
    trim: Optional[int] = None,
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
    trim = ov // 4 if trim is None else max(0, min(trim, ov // 2))

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
