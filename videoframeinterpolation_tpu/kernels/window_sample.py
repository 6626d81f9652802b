"""Windowed deformable sampling: strip-gather + Pallas in-window taps.

The deformable attention's sample positions decompose as
``q + flow(q) + residual(q, g, s)`` with ``|residual| <= offset_scale``
(``nn/deformable_attn.py``): the per-pixel flow is SHARED by all groups and
samples, so all ``G*S`` samples of a query live inside one
``WIN x WIN`` window around ``floor(q + flow)`` with
``WIN = 2*offset_scale + 2``.

XLA gathers cost ~per row (tools/perf/README.md), so instead of one row per
(group, sample) — ``2B * G * S * H * W`` rows — we fetch ``WIN`` contiguous
row-strips per query (``2B * H * W * WIN`` rows, 32x fewer at the flagship's
finest level) and resolve the individual bilinear taps inside a Pallas
kernel: a single-vreg lane-gather picks the two x-taps (lane indices are
window-local, < 128) and an unrolled select-accumulate over the WIN dy
values picks the two y-rows.

Constraints honored (measured on this Mosaic/remote-compile stack):
lane-dim ``take_along_axis`` requires f32 operands and <= 4096 rows per
call; window extents must keep lane indices < 128 (WIN <= 64).

Forward-only (inference path): the training path keeps the plain XLA
sampler, whose autodiff VJP is exact.

STATUS — measured negative result (kept as a documented experiment, NOT
wired into the models): at the flagship's finest level this kernel runs
~3.3 s vs the XLA quad-gather sampler's ~0.12 s on v5e. The in-kernel
relayouts required to make the window's dx axis gatherable (static lane
slices + stack into an 18-lane-minor buffer) waste 110/128 lanes of every
vector op, and the Mosaic lane gather requires a further pad to 128 lanes;
the resulting per-tile cost is ~90x the lane-dense ideal. Closing that gap
needs a hardware gather across more than one vreg, which this Mosaic stack
does not expose (tools/perf/README.md). The same window decomposition was
subsequently re-expressed in pure XLA with tent-weight MXU einsums doing
the in-window tap resolution — ``ops/windowed.py``, the production fast
path (``window_sampling`` config flag). This file preserves the Mosaic
variant of the decomposition and its exact-parity tests for future
toolchains.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _fetch_windows(feat: Array, sy: Array, sx: Array, win: int) -> Array:
    """Gather WIN row-strips of WIN pixels per query.

    Args:
      feat: ``(B2, H, W, C)``.
      sy, sx: ``(B2, N)`` int32 window origins (unpadded coords, already
        clamped to ``[-pad, H - win + pad]`` with ``pad = win // 2``).

    Returns:
      ``(B2, N, win, win * C)`` window rows (dy-major).
    """
    B2, H, W, C = feat.shape
    N = sy.shape[1]
    pad = win // 2
    featp = jnp.pad(feat, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    Hp, Wp = H + 2 * pad, W + 2 * pad
    fp = featp.reshape(B2, Hp, Wp * C)

    dy = jnp.arange(win, dtype=jnp.int32)
    ys = sy[:, :, None] + pad + dy[None, None, :]          # (B2, N, win)
    xs = jnp.broadcast_to(((sx + pad) * C)[:, :, None], ys.shape)
    starts = jnp.stack([ys, xs], axis=-1).reshape(B2, N * win, 2)

    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(2,),
        collapsed_slice_dims=(1,),
        start_index_map=(1, 2),
        operand_batching_dims=(0,),
        start_indices_batching_dims=(0,),
    )
    out = jax.lax.gather(
        fp, starts, dnums, slice_sizes=(1, 1, win * C),
        mode=jax.lax.GatherScatterMode.CLIP,
    )
    return out.reshape(B2, N, win, win * C)


def _make_kernel(win: int, G: int, S: int, C: int, TQ: int):
    Cg = C // G
    S2 = 2 * S  # lanes: [x0 taps | x1 taps]
    LANES = 128
    assert S2 <= LANES and win <= LANES

    def kernel(wt_ref, lx0_ref, ly0_ref, wx_ref, wy_ref,
               mx0_ref, mx1_ref, my0_ref, my1_ref, out_ref):
        # wt: (TQ, win, win*C) bf16 — (dy, dx*C + c), the gather's natural
        # layout (a dx-minor layout would lane-pad win->128 in HBM, 7x).
        # Build the dx-minor view in VMEM via static lane slices.
        w = wt_ref[:].astype(jnp.float32)
        x = jnp.stack(
            [w[:, :, dx * C:(dx + 1) * C] for dx in range(win)], axis=-1
        )  # (TQ, win, C, win)
        x = x.reshape(TQ * win * C, win)
        x = jnp.pad(x, ((0, 0), (0, LANES - win)))

        def expand(v, dtype):
            # (TQ, G, S) -> lanes [v | v] -> broadcast over (win? no) (Cg)
            both = jnp.concatenate([v, v], axis=-1)         # (TQ, G, 2S)
            both = jnp.pad(both, ((0, 0), (0, 0), (0, LANES - S2)))
            e = jnp.broadcast_to(both[:, :, None, :], (TQ, G, Cg, LANES))
            return e.reshape(TQ, C, LANES).astype(dtype)

        lx0 = lx0_ref[:]
        # x-tap lane indices: [lx0 | lx0 + 1]
        xt = jnp.concatenate([lx0, lx0 + 1], axis=-1)       # (TQ, G, 2S)
        xt = jnp.pad(xt, ((0, 0), (0, 0), (0, LANES - S2)))
        idx = jnp.broadcast_to(xt[:, :, None, :], (TQ, G, Cg, LANES))
        idx = idx.reshape(TQ, C, LANES)
        idx = jnp.clip(idx, 0, win - 1)
        idx_full = jnp.broadcast_to(
            idx[:, None, :, :], (TQ, win, C, LANES)
        ).reshape(TQ * win * C, LANES)

        A = jnp.take_along_axis(x, idx_full, axis=1)
        A = A.reshape(TQ, win, C, LANES)

        ly0 = expand(ly0_ref[:], jnp.int32)                 # (TQ, C, LANES)
        B0 = jnp.zeros((TQ, C, LANES), jnp.float32)
        B1 = jnp.zeros((TQ, C, LANES), jnp.float32)
        for dyv in range(win):
            plane = A[:, dyv]
            B0 = B0 + jnp.where(ly0 == dyv, plane, 0.0)
            B1 = B1 + jnp.where(ly0 == dyv - 1, plane, 0.0)

        wx = expand(wx_ref[:], jnp.float32)
        wy = expand(wy_ref[:], jnp.float32)
        mx0 = expand(mx0_ref[:], jnp.float32)
        mx1 = expand(mx1_ref[:], jnp.float32)
        my0 = expand(my0_ref[:], jnp.float32)
        my1 = expand(my1_ref[:], jnp.float32)

        # lanes [0:S] = x0 tap, [S:2S] = x1 tap.
        row = (1.0 - wy) * my0 * B0 + wy * my1 * B1          # (TQ, C, LANES)
        v0 = row[:, :, 0:S]
        v1 = row[:, :, S:S2]
        wx0 = wx[:, :, 0:S]
        out = ((1.0 - wx0) * mx0[:, :, 0:S] * v0
               + wx0 * mx1[:, :, 0:S] * v1)
        out_ref[:] = out.astype(out_ref.dtype)

    return kernel


@functools.partial(jax.jit, static_argnames=("n_groups", "offset_scale",
                                             "interpret"))
def windowed_deformable_sample(
    feat: Array,
    flow: Array,
    residual: Array,
    n_groups: int,
    offset_scale: float,
    interpret: bool = False,
) -> Array:
    """Drop-in replacement for ``_grouped_deformable_sample(feat,
    residual + flow[..., None, None, :], n_groups)`` when residuals are
    bounded by ``offset_scale``.

    Args:
      feat: ``(B2, H, W, C)``.
      flow: ``(B2, H, W, 2)`` shared per-pixel flow ``(fx, fy)``.
      residual: ``(B2, H, W, G, S, 2)`` bounded sample offsets.

    Returns:
      ``(B2, S, H*W, C)`` sampled key/values (zeros-padding semantics).
    """
    B2, H, W, C = feat.shape
    G = n_groups
    S = residual.shape[4]
    sc = int(offset_scale)
    win = 2 * sc + 2
    pad = win // 2

    gy, gx = jnp.meshgrid(
        jnp.arange(H, dtype=jnp.float32),
        jnp.arange(W, dtype=jnp.float32), indexing="ij",
    )
    px = gx[None] + flow[..., 0].astype(jnp.float32)   # abs sample center x
    py = gy[None] + flow[..., 1].astype(jnp.float32)

    sx = jnp.floor(px).astype(jnp.int32) - sc          # window origin
    sy = jnp.floor(py).astype(jnp.int32) - sc
    sx = jnp.clip(sx, -pad, W - win + pad)
    sy = jnp.clip(sy, -pad, H - win + pad)

    N = H * W
    windows = _fetch_windows(feat, sy.reshape(B2, N), sx.reshape(B2, N), win)
    # (B2, N, win, win*C) -> (B2*N, win, win*C): leading-dim split only, no
    # relayout; the kernel builds the dx-minor view in VMEM.
    wt = windows.reshape(B2 * N, win, win * C)

    # Absolute tap positions and window-local fractional coords.
    res = residual.astype(jnp.float32)
    ax = px[:, :, :, None, None] + res[..., 0]          # (B2, H, W, G, S)
    ay = py[:, :, :, None, None] + res[..., 1]
    lx = ax - sx[:, :, :, None, None].astype(jnp.float32)
    ly = ay - sy[:, :, :, None, None].astype(jnp.float32)
    lx0 = jnp.floor(lx).astype(jnp.int32)
    ly0 = jnp.floor(ly).astype(jnp.int32)
    wx = lx - lx0.astype(jnp.float32)
    wy = ly - ly0.astype(jnp.float32)

    ax0 = jnp.floor(ax).astype(jnp.int32)
    ay0 = jnp.floor(ay).astype(jnp.int32)

    def inb_x(v):
        return ((v >= 0) & (v <= W - 1)).astype(jnp.float32)

    def inb_y(v):
        return ((v >= 0) & (v <= H - 1)).astype(jnp.float32)

    def flat(v):
        return v.reshape(B2 * N, G, S)

    TQ = 2
    # Pad rows to a TQ multiple.
    R = B2 * N
    Rp = -(-R // TQ) * TQ
    if Rp != R:
        padr = lambda a: jnp.pad(  # noqa: E731
            a, ((0, Rp - R),) + ((0, 0),) * (a.ndim - 1))
    else:
        padr = lambda a: a  # noqa: E731

    kernel = _make_kernel(win, G, S, C, TQ)
    grid = Rp // TQ
    specs_compact = pl.BlockSpec((TQ, G, S), lambda i: (i, 0, 0),
                                 memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((TQ, win, win * C), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + [specs_compact] * 8,
        out_specs=pl.BlockSpec((TQ, C, S), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Rp, C, S), feat.dtype),
        interpret=interpret,
    )(
        padr(wt),
        padr(flat(lx0)), padr(flat(ly0)),
        padr(flat(wx)), padr(flat(wy)),
        padr(flat(inb_x(ax0))), padr(flat(inb_x(ax0 + 1))),
        padr(flat(inb_y(ay0))), padr(flat(inb_y(ay0 + 1))),
    )
    out = out[:R]  # (B2*N, C, S)
    return out.reshape(B2, N, C, S).transpose(0, 3, 1, 2)
