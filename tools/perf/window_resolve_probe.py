"""Decompose the windowed deformable-sampling cost on the real TPU.

The round-2 windowed path (`ops/windowed.py`) measured 2.3x SLOWER than the
per-tap gather path at the flagship's lv1 shape (224-283 ms vs 121 ms,
`window_path_bench.py`), even though its strip fetch should cost ~15 ms by
the measured gather cost model. This probe times the band pipeline stage by
stage and A/Bs reformulations of the tent-weight contractions to find the
formulation that actually reaches MXU/VPU speed.

Stages (cumulative unless noted):
  fetch      packed strip fetch + sum            (gather cost only)
  weights    tent-weight construction + sum      (independent, not cumulative)
  e1         fetch + x-contraction einsum        (the 47G MAC step)
  full       current production band (x then y)
  yfirst     y-contraction first, then x
  w2         merged outer-product weights, one K^2 contraction
  dotg       x-contraction as explicit dot_general, (S,Kx)@(Kx,Ky*Cg) batched
  nminor     queries-last VPU layout for both contractions

Usage: python tools/perf/window_resolve_probe.py [--level lv1|lv2]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import math

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from bench import time_loop


def build_inputs(level: str):
    if level == "lv1":
        H, W, G, S, osc = 128, 224, 8, 32, 8.0
    else:
        H, W, G, S, osc = 64, 112, 8, 16, 4.0
    B, C = 2, 72
    rng = np.random.default_rng(0)
    feat = jnp.asarray(rng.standard_normal((B, H, W, C)).astype(np.float32),
                       jnp.bfloat16)
    flow = jnp.asarray(rng.uniform(-20, 20, (B, H, W, 2)).astype(np.float32))
    res = jnp.asarray(
        rng.uniform(-osc, osc, (B, H, W, G, S, 2)).astype(np.float32),
        jnp.bfloat16)
    return feat, flow, res, G, osc


def make_stage(stage: str, G: int, osc: float, q_chunk: int = 2048):
    """Returns f(feat, flow, res) -> scalar for the given stage."""
    r = int(math.ceil(osc)) + 1
    K = 2 * r + 1
    f32 = jnp.float32

    def run(feat, flow, res_offsets):
        B, H, W, C = feat.shape
        S = res_offsets.shape[4]
        Cg = C // G
        N = H * W
        dt = feat.dtype

        fp = jnp.pad(feat, ((0, 0), (1, 1), (K, K), (0, 0)))
        Wp = W + 2 * K
        row_len = Wp - K + 1
        packed = jnp.concatenate(
            [fp[:, :, dx:dx + row_len] for dx in range(K)], axis=-1)
        flat = packed.reshape(B, (H + 2) * row_len, K * C)

        flow = flow.astype(f32)
        c0 = jnp.floor(flow)
        frac = flow - c0
        ci = c0.astype(jnp.int32)
        gy, gx = jnp.meshgrid(jnp.arange(H, dtype=jnp.int32),
                              jnp.arange(W, dtype=jnp.int32), indexing="ij")
        iy = (gy[None] + ci[..., 1])[..., None] + (
            jnp.arange(K, dtype=jnp.int32) - r)
        row = jnp.clip(iy, -1, H) + 1
        col0 = jnp.clip(gx[None] + ci[..., 0] - r, -K, W) + K
        starts = (row * row_len + col0[..., None]).reshape(B, N, K)

        res = res_offsets.astype(f32)
        u_x = (res[..., 0] + frac[..., None, None, 0] + r).reshape(B, N, G, S)
        u_y = (res[..., 1] + frac[..., None, None, 1] + r).reshape(B, N, G, S)
        u_x = jnp.clip(u_x, 0.0, K - 1.0)
        u_y = jnp.clip(u_y, 0.0, K - 1.0)
        taps = jnp.arange(K, dtype=f32)

        def fetch(st_c, n):
            rows = jnp.take_along_axis(
                flat, st_c.reshape(B, n * K)[..., None], axis=1)
            return rows.reshape(B, n, K, K, C)

        def band(args):
            st_c, ux_c, uy_c = args
            n = st_c.shape[1]
            if stage == "weights":
                wx = jax.nn.relu(1.0 - jnp.abs(ux_c[..., None] - taps))
                wy = jax.nn.relu(1.0 - jnp.abs(uy_c[..., None] - taps))
                return (jnp.sum(wx.astype(f32), axis=(2, 3, 4))
                        + jnp.sum(wy.astype(f32), axis=(2, 3, 4)))
            win = fetch(st_c, n)
            if stage == "fetch":
                return jnp.sum(win.astype(f32), axis=(2, 3, 4))
            win = win.reshape(B, n, K, K, G, Cg)
            wx = jax.nn.relu(1.0 - jnp.abs(ux_c[..., None] - taps)).astype(dt)
            wy = jax.nn.relu(1.0 - jnp.abs(uy_c[..., None] - taps)).astype(dt)
            if stage == "e1":
                tmp = jnp.einsum("bngsx,bnyxgc->bngsyc", wx, win)
                return jnp.sum(tmp.astype(f32), axis=(2, 3, 4, 5))
            if stage == "full":
                tmp = jnp.einsum("bngsx,bnyxgc->bngsyc", wx, win)
                out = jnp.einsum("bngsy,bngsyc->bngsc", wy, tmp)
            elif stage == "yfirst":
                tmp = jnp.einsum("bngsy,bnyxgc->bngsxc", wy, win)
                out = jnp.einsum("bngsx,bngsxc->bngsc", wx, tmp)
            elif stage == "w2":
                w2 = (wx[:, :, :, :, None, :] * wy[..., None]).reshape(
                    B, n, G, S, K * K)
                out = jnp.einsum(
                    "bngsk,bnkgc->bngsc", w2,
                    win.reshape(B, n, K * K, G, Cg))
            elif stage == "dotg":
                # x-contraction as one batched matmul (S,Kx)@(Kx,Ky*Cg),
                # batch (B,n,G); win transposed so Kx is the contraction.
                win_t = win.transpose(0, 1, 4, 3, 2, 5).reshape(
                    B, n, G, K, K * Cg)
                tmp = lax.dot_general(
                    wx, win_t,
                    (((4,), (3,)), ((0, 1, 2), (0, 1, 2))),
                    preferred_element_type=f32,
                ).astype(dt).reshape(B, n, G, S, K, Cg)
                out = jnp.einsum("bngsy,bngsyc->bngsc", wy, tmp)
            elif stage == "nminor":
                # Queries-last: contractions vectorize over n on lanes.
                win_n = win.transpose(0, 4, 2, 3, 5, 1)   # (B,G,Ky,Kx,Cg,n)
                wx_n = wx.transpose(0, 2, 3, 4, 1)        # (B,G,S,Kx,n)
                wy_n = wy.transpose(0, 2, 3, 4, 1)
                tmp = jnp.einsum("bgsxn,bgyxcn->bgsycn", wx_n, win_n)
                out_n = jnp.einsum("bgsyn,bgsycn->bgscn", wy_n, tmp)
                out = out_n.transpose(0, 4, 1, 2, 3)
            else:
                raise ValueError(stage)
            return jnp.sum(out.astype(f32), axis=tuple(range(2, out.ndim)))

        cq = min(q_chunk, N)
        n_chunks = -(-N // cq)
        pad = n_chunks * cq - N
        if pad:
            starts_p = jnp.pad(starts, ((0, 0), (0, pad), (0, 0)))
            ux_p = jnp.pad(u_x, ((0, 0), (0, pad), (0, 0), (0, 0)))
            uy_p = jnp.pad(u_y, ((0, 0), (0, pad), (0, 0), (0, 0)))
        else:
            starts_p, ux_p, uy_p = starts, u_x, u_y

        def split(x):
            sh = list(x.shape)
            sh[1:2] = [n_chunks, cq]
            return jnp.moveaxis(x.reshape(sh), 1, 0)

        out = lax.map(band, (split(starts_p), split(ux_p), split(uy_p)))
        return jnp.sum(out)

    return run


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--level", default="lv1", choices=["lv1", "lv2"])
    ap.add_argument("--q_chunk", type=int, default=2048)
    ap.add_argument("--stages", default="fetch,weights,e1,full,yfirst,w2,dotg,nminor")
    args = ap.parse_args()

    feat, flow, res, G, osc = build_inputs(args.level)

    for stage in args.stages.split(","):
        f = make_stage(stage, G, osc, args.q_chunk)

        def wrap(feat, flow, res):
            return f(feat, flow, res)

        try:
            sec = time_loop(wrap, (feat, flow, res), n_hi=5, reps=2)
            print(f"{args.level} {stage:8s}: {sec*1e3:8.3f} ms", flush=True)
        except Exception as e:
            print(f"{args.level} {stage:8s}: FAILED {type(e).__name__}: "
                  f"{str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()
