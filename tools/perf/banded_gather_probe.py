"""Validate the banded-gather hypothesis behind the 720p gather tax.

Measured cost model (tools/perf/README.md): XLA row gathers cost ~8-12
ns/row when the operand is <= ~16 MB, ~25-40 ns/row when it is far larger
(the 720p quad-packed tables are ~133 MB/frame). Hypothesis: the fast
regime is a VMEM-resident operand; bwarp / deformable-sampling indices
are spatially coherent (query + smooth flow + tanh-bounded offsets), so
slicing the table into row-bands and gathering each query band from its
own <= 16 MB window should restore the fast regime at HD.

This probes exactly that, model-free:
  baseline : one gather of N coherent rows from a (R, C) table
  banded   : static loop over query bands; per band, dynamic_slice a
             (rows_band + 2*halo, C) window, gather band queries locally
Indices mimic lv1 bwarp at 720p: row = query_row + smooth flow field
bounded by +-FLOW.

Usage (ONE TPU process at a time):
  python tools/perf/banded_gather_probe.py [--hw 360x641] [--ch 288]
      [--bands 12] [--flow 24]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import numpy as np
import jax
import jax.numpy as jnp

from bench import time_loop

ap = argparse.ArgumentParser()
ap.add_argument("--hw", default="360x641",
                help="table grid HxW (rows = H*W); 720p lv1 table = 360x641")
ap.add_argument("--ch", type=int, default=288,
                help="row width (quad-packed 72ch = 288)")
ap.add_argument("--bands", type=int, default=12)
ap.add_argument("--flow", type=int, default=24,
                help="max |row displacement| of the coherent index field")
ap.add_argument("--batch", type=int, default=2,
                help="tables/queries per call (2 = both frames)")
args = ap.parse_args()

H, W = (int(v) for v in args.hw.split("x"))
C, B = args.ch, args.batch
R = H * W
dt = jnp.bfloat16

rng = np.random.default_rng(0)
table = jnp.asarray(rng.standard_normal((B, R, C)).astype(np.float32), dt)

# Coherent bwarp-like indices: one per grid position, displaced by a smooth
# bounded field (same field for every batch entry; realistic enough).
yy, xx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
fy = (args.flow * np.sin(2 * np.pi * xx / W * 3) *
      np.cos(2 * np.pi * yy / H * 2)).astype(np.int64)
fx = (args.flow * np.cos(2 * np.pi * xx / W * 2)).astype(np.int64)
ty = np.clip(yy + fy, 0, H - 1)
tx = np.clip(xx + fx, 0, W - 1)
idx_grid = (ty * W + tx).astype(np.int32)          # (H, W)
idx = jnp.asarray(idx_grid.reshape(-1))             # (R,)

table_mb = B * R * C * 2 / 1e6
print(f"table {B}x{R}x{C} bf16 = {table_mb:.0f} MB total, "
      f"{R} rows gathered/frame, flow +-{args.flow} rows", flush=True)


def baseline(table, idx):
    return jnp.take(table, idx, axis=1)


nb = args.bands
assert H % nb == 0, "bands must divide H"
hb = H // nb
halo = args.flow  # window covers band +- flow rows
win_rows = (hb + 2 * halo) * W
win_mb = B * win_rows * C * 2 / 1e6
print(f"band window {hb}+2*{halo} grid rows = {win_rows} table rows "
      f"= {win_mb:.1f} MB total", flush=True)

idx_bands = jnp.asarray(idx_grid.reshape(nb, hb * W))


def banded(table, idx_bands):
    outs = []
    for b in range(nb):
        start = max(0, min(b * hb - halo, H - hb - 2 * halo)) * W
        win = jax.lax.dynamic_slice(
            table, (0, start, 0), (B, win_rows, C))
        local = idx_bands[b] - start
        outs.append(jnp.take(win, local, axis=1))
    return jnp.concatenate(outs, axis=1)


# time_loop chains its SECOND positional arg through iterations (with a
# 1e-12 * out perturbation), so the table is the chained arg: the gather
# output has the table's shape for both formulations (R rows in, R out).
for name, fn, iarg in (("baseline", baseline, idx),
                       ("banded", banded, idx_bands)):
    sec = time_loop(lambda i, t: fn(t, i), (iarg, table), n_hi=9)
    ns_row = sec / (B * R) * 1e9
    print(f"{name:9s}: {sec * 1e3:7.3f} ms = {ns_row:5.1f} ns/row",
          flush=True)
