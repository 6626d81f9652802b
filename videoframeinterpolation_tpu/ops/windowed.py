"""Windowed deformable sampling — exact fast path for grouped grid-sampling.

Computes the *same function* as ``_grouped_deformable_sample`` (reference
semantics ``modules/deformable_attn.py:88-101``: per query pixel, ``S``
bilinear samples per channel group at ``flow + res`` with
``F.grid_sample(padding_mode='zeros')``), but replaces the per-tap gathers —
``2·B·G·S·H·W`` rows, the flagship's measured bottleneck at ~8-13 ns/row on
v5e (``tools/perf/README.md``) — with ``2·B·H·W·K`` horizontal window-strip
rows plus MXU tent-weight contractions: a ``G·S/K ≈ 13x`` row reduction at
the finest level.

Why it is exact:

  * every sample of query ``p`` lies at ``p + flow(p) + res`` with
    ``|res| <= offset_scale``, so all ``G·S`` samples *and their bilinear
    taps* fall inside a ``K x K`` window centered at ``p + floor(flow(p))``
    where ``K = 2·(ceil(offset_scale)+1)+1`` — one window fetch per query
    serves every group and sample;
  * bilinear interpolation over the integer window grid is the tent-weight
    contraction ``Σ_k relu(1-|u-k|)·win[k]`` (exactly two nonzero weights,
    the floor/ceil taps), which also reproduces ``grid_sample``'s gradient
    with respect to the sampling locations under autodiff;
  * ``padding_mode='zeros'`` per-tap semantics map to zero padding of the
    window fetch (1 row of y-padding, ``K`` columns of x-padding, with
    clamped starts landing fully-out-of-bounds strips inside the padding).

The sequential ``q_chunk`` banding bounds the live window tensor (the full
window tensor at 720p would not fit HBM), which also makes the flagship
HD-viable full-frame.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax import lax

Array = jax.Array


def gather_strip_rows(flat: Array, starts: Array, k: int, width: int) -> Array:
    """Gather ``k``-pixel horizontal strips from a flattened padded map.

    Args:
      flat: ``(P, C)`` row-major flattened ``(Hp, Wp)`` feature map.
      starts: ``(N,)`` int32 flat strip starts (``row*Wp + col``); each strip
        ``[start, start+k)`` must stay inside one padded image row.
      k: strip length in pixels.
      width: channel count ``C`` (static).

    Returns:
      ``(N, k, C)`` gathered strips.
    """
    dnums = lax.GatherDimensionNumbers(
        offset_dims=(1, 2),
        collapsed_slice_dims=(),
        start_index_map=(0,),
    )
    return lax.gather(
        flat, starts[:, None], dnums, slice_sizes=(k, width),
        mode=lax.GatherScatterMode.CLIP,
    )


def windowed_deformable_sample(
    feat: Array,
    flow: Array,
    res_offsets: Array,
    n_groups: int,
    offset_scale: float,
    q_chunk: int = 2048,
    impl: str = "slice",
) -> Array:
    """Grouped deformable sampling via per-query window strips.

    Drop-in equivalent of ``_grouped_deformable_sample(feat, flow + res)``:

    Args:
      feat: ``(B, H, W, C)`` source features, channels in ``n_groups`` blocks.
      flow: ``(B, H, W, 2)`` pixel flows ``(fx, fy)`` seeding all samples.
      res_offsets: ``(B, H, W, G, S, 2)`` residual pixel offsets ``(dx, dy)``
        with ``|res| <= offset_scale``.
      n_groups: channel group count ``G``.
      offset_scale: static bound on ``|res_offsets|`` (sets the window size).
      q_chunk: queries per sequential band — bounds the live window tensor
        to ``B·q_chunk·K²·C`` elements.
      impl: strip fetch formulation — ``"slice"`` gathers ``(K, C)`` slices
        straight from the padded map (one gather index per strip);
        ``"packed"`` pre-packs each K-pixel strip into one table row
        (K x map memory) and gathers single rows via ``take_along_axis``,
        the formulation already proven fast for quads in ``ops/interp.py``.

    Returns:
      ``(B, S, H*W, C)`` sampled key/value tensor (zeros out of bounds).
    """
    if impl not in ("slice", "packed"):
        raise ValueError(f"unknown impl: {impl!r}")
    B, H, W, C = feat.shape
    G = n_groups
    S = res_offsets.shape[4]
    Cg = C // G
    N = H * W
    r = int(math.ceil(offset_scale)) + 1
    K = 2 * r + 1
    f32 = jnp.float32

    # Padded map: 1 zero row above/below (any OOB row index clamps into it),
    # K zero columns left/right (any OOB strip segment reads zeros).
    fp = jnp.pad(feat, ((0, 0), (1, 1), (K, K), (0, 0)))
    Wp = W + 2 * K
    if impl == "slice":
        row_len = Wp
        flat = fp.reshape(B, (H + 2) * Wp, C)

        def fetch(fl, st, n):
            return jax.vmap(
                lambda f, s: gather_strip_rows(f, s, K, C)
            )(fl, st).reshape(B, n, K, K, C)
    else:
        # Pack each K-pixel strip into one table row (K x map memory);
        # strips then cost exactly one gathered row each.
        row_len = Wp - K + 1
        packed = jnp.concatenate(
            [fp[:, :, dx:dx + row_len] for dx in range(K)], axis=-1)
        flat = packed.reshape(B, (H + 2) * row_len, K * C)

        def fetch(fl, st, n):
            rows = jnp.take_along_axis(fl, st[..., None], axis=1)
            return rows.reshape(B, n, K, K, C)

    # Window centers: query + floor(flow). In-window tap coordinate
    # u = frac(flow) + res + r lies in (0, K-1).
    flow = flow.astype(f32)
    c = jnp.floor(flow)
    frac = flow - c
    ci = c.astype(jnp.int32)
    gy, gx = jnp.meshgrid(jnp.arange(H, dtype=jnp.int32),
                          jnp.arange(W, dtype=jnp.int32), indexing="ij")
    iy = (gy[None] + ci[..., 1])[..., None] + (
        jnp.arange(K, dtype=jnp.int32) - r)            # (B, H, W, K)
    row = jnp.clip(iy, -1, H) + 1
    col0 = jnp.clip(gx[None] + ci[..., 0] - r, -K, W) + K  # (B, H, W)
    starts = (row * row_len + col0[..., None]).reshape(B, N, K)

    res = res_offsets.astype(f32)
    u_x = (res[..., 0] + frac[..., None, None, 0] + r).reshape(B, N, G, S)
    u_y = (res[..., 1] + frac[..., None, None, 1] + r).reshape(B, N, G, S)
    u_x = jnp.clip(u_x, 0.0, K - 1.0)
    u_y = jnp.clip(u_y, 0.0, K - 1.0)

    taps = jnp.arange(K, dtype=f32)
    dt = feat.dtype

    def band(args):
        st_c, ux_c, uy_c = args
        n = st_c.shape[1]
        win = fetch(flat, st_c.reshape(B, n * K), n)
        win = win.reshape(B, n, K, K, G, Cg)           # (b, n, ky, kx, g, cg)

        # Bilinear tent weights over the integer window grid (exactly the
        # floor/ceil taps are nonzero; grid_sample-identical gradients).
        wx = jax.nn.relu(1.0 - jnp.abs(ux_c[..., None] - taps)).astype(dt)
        wy = jax.nn.relu(1.0 - jnp.abs(uy_c[..., None] - taps)).astype(dt)

        # Resolve taps: contract the window x-axis, then the (2-tap) y-axis.
        tmp = jnp.einsum("bngsx,bnyxgc->bngsyc", wx, win)
        out = jnp.einsum("bngsy,bngsyc->bngsc", wy, tmp)
        return out                                      # (b, n, g, s, cg)

    cq = min(q_chunk, N)
    n_chunks = -(-N // cq)
    if n_chunks == 1:
        out = band((starts, u_x, u_y))
    else:
        pad = n_chunks * cq - N
        if pad:
            starts = jnp.pad(starts, ((0, 0), (0, pad), (0, 0)))
            u_x = jnp.pad(u_x, ((0, 0), (0, pad), (0, 0), (0, 0)))
            u_y = jnp.pad(u_y, ((0, 0), (0, pad), (0, 0), (0, 0)))

        def split(x):
            sh = list(x.shape)
            sh[1:2] = [n_chunks, cq]
            return jnp.moveaxis(x.reshape(sh), 1, 0)

        out = lax.map(band, (split(starts), split(u_x), split(u_y)))
        out = jnp.moveaxis(out, 0, 1).reshape(B, n_chunks * cq, G, S, Cg)
        out = out[:, :N]

    # (B, N, G, S, Cg) -> (B, S, N, G*Cg), group blocks on channels.
    return out.transpose(0, 3, 1, 2, 4).reshape(B, S, N, C)
