"""Softmax-splatting forward warp (deterministic TPU scatter design).

TPU-native replacement for the reference's three hand-written CUDA kernels
(``modules/softsplat.py:289-529``): a bilinear scatter-add forward
(``softsplat_out``), its input gradient (``softsplat_ingrad``, a gather) and
its flow gradient (``softsplat_flowgrad``, channel-summed weight derivatives).

Design:
  * The forward is a single XLA ``scatter-add`` over a flattened ``H*W + 1``
    axis (the extra slot is a trash bin for out-of-bounds taps). On TPU, XLA
    scatter-add is executed deterministically — an upgrade over the
    reference's ``atomicAdd`` float nondeterminism (SURVEY.md section 5.2).
  * Gradients come from JAX autodiff of the scatter/bilinear-weight
    expression. The VJP of scatter-add is exactly the gather the reference's
    ``softsplat_ingrad`` kernel implements, and the flow cotangent
    automatically sums the weight derivatives over channels as
    ``softsplat_flowgrad`` does — no custom VJP is needed for correctness,
    and XLA fuses the weight algebra into the gather.

Semantics match the CUDA kernel: target position ``(x + fx, y + fy)``,
four corner taps with bilinear weights, each tap dropped if its corner is
out of bounds (reference ``modules/softsplat.py:289-350``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def softsplat_raw(x: Array, flow: Array) -> Array:
    """Raw bilinear scatter-add of ``x`` along ``flow`` (mode='sum' core).

    Args:
      x: ``(B, H, W, C)`` values to splat.
      flow: ``(B, H, W, 2)`` forward flow ``(fx, fy)`` in pixels.

    Returns:
      ``(B, H, W, C)`` splatted output (zeros where nothing lands).
    """
    B, H, W, C = x.shape
    compute_dtype = x.dtype
    # fp32 target positions regardless of compute dtype (the reference casts
    # inputs to float32 under AMP, modules/softsplat.py:284).
    gy, gx = jnp.meshgrid(
        jnp.arange(H, dtype=jnp.float32),
        jnp.arange(W, dtype=jnp.float32),
        indexing="ij",
    )
    tx = gx[None] + flow[..., 0].astype(jnp.float32)
    ty = gy[None] + flow[..., 1].astype(jnp.float32)

    x0f = jnp.floor(tx)
    y0f = jnp.floor(ty)
    wx = (tx - x0f).astype(compute_dtype)
    wy = (ty - y0f).astype(compute_dtype)
    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)
    x1 = x0 + 1
    y1 = y0 + 1

    trash = H * W  # out-of-bounds taps land in an extra slot
    out = jnp.zeros((B, H * W + 1, C), compute_dtype)

    xf = x.reshape(B, H * W, C)
    taps = (
        (x0, y0, (1.0 - wx) * (1.0 - wy)),
        (x1, y0, wx * (1.0 - wy)),
        (x0, y1, (1.0 - wx) * wy),
        (x1, y1, wx * wy),
    )
    for xi, yi, w in taps:
        valid = (xi >= 0) & (xi <= W - 1) & (yi >= 0) & (yi <= H - 1)
        idx = jnp.where(valid, yi * W + jnp.clip(xi, 0, W - 1), trash)
        idx = idx.reshape(B, H * W)
        contrib = xf * w.reshape(B, H * W)[..., None]
        out = out.at[
            jnp.arange(B)[:, None], idx
        ].add(contrib, mode="drop")
    return out[:, : H * W].reshape(B, H, W, C)


def softsplat(
    x: Array,
    flow: Array,
    metric: Array | None = None,
    mode: str = "soft",
) -> Array:
    """Forward warping with sum/avg/linear/soft normalization modes.

    Mirrors ``fwarp`` (reference ``modules/warp.py:18-59``) including the
    ``-addeps`` / ``-zeroeps`` / ``-clipeps`` denominator variants.

    Args:
      x: ``(B, H, W, C)``.
      flow: ``(B, H, W, 2)`` forward flow in pixels.
      metric: ``(B, H, W, 1)`` importance metric (required for linear/soft).
      mode: ``'sum' | 'avg' | 'linear' | 'soft'``, optionally suffixed with
        ``-addeps`` (default), ``-zeroeps`` or ``-clipeps``.
    """
    base = mode.split("-")[0]
    if base not in ("sum", "avg", "linear", "soft"):
        raise ValueError(f"unsupported mode: {mode}")
    if base in ("sum", "avg") and metric is not None:
        raise ValueError(f"mode {mode} takes no metric")
    if base in ("linear", "soft") and metric is None:
        raise ValueError(f"mode {mode} requires a metric")

    if base == "sum":
        return softsplat_raw(x, flow)

    if base == "avg":
        ones = jnp.ones(x.shape[:3] + (1,), x.dtype)
        inp = jnp.concatenate([x, ones], axis=-1)
    elif base == "linear":
        inp = jnp.concatenate([x * metric, metric], axis=-1)
    else:  # soft
        m = jnp.exp(metric)
        inp = jnp.concatenate([x * m, m], axis=-1)

    out = softsplat_raw(inp, flow)
    norm = out[..., -1:]

    parts = mode.split("-")
    variant = parts[1] if len(parts) > 1 else "addeps"
    if variant == "addeps":
        norm = norm + 1e-7
    elif variant == "zeroeps":
        norm = jnp.where(norm == 0.0, 1.0, norm)
    elif variant == "clipeps":
        norm = jnp.clip(norm, 1e-7, None)
    else:
        raise ValueError(f"unsupported eps variant: {mode}")
    return out[..., :-1] / norm
