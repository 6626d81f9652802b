"""Measure gather ns/row for the COHERENT (flow-warp) gather class.

The roofline's 13 ns/row gather price was measured on the flagship's
deformable sampler — per-query learned offsets, effectively random row
indices. Dense backward warps (``ops/warp.py:bwarp``, the IFRNet/M2M hot
gather) fetch rows along a smooth flow field, so neighboring queries hit
neighboring table rows and the HBM row-buffer/cache amortizes fetches;
pricing them at the incoherent rate over-predicts IFRNet ~2.3x
(roofline.py --measured_ms 2.59: predicted 6.1 ms, gather bucket alone
3.96 ms).

This probe times the SAME quad-packed gather kernel
(``ops/interp.py:grid_sample``) at an IFRNet-scale shape under three
index regimes and writes results/gather_rates.json:

  smooth   — coordinates = identity + smooth low-magnitude flow (bwarp)
  random   — uniform random coordinates (deformable worst case)
  deform   — random within a +-8 px neighborhood of identity (DAT-like)

Usage (ONE TPU process at a time):
  python tools/perf/warp_gather_probe.py [--hw 256 448] [--ch 32] [--b 4]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import numpy as np
import jax
import jax.numpy as jnp

from bench import time_loop
from videoframeinterpolation_tpu.ops.interp import grid_sample

ap = argparse.ArgumentParser()
ap.add_argument("--hw", type=int, nargs=2, default=(256, 448))
ap.add_argument("--ch", type=int, default=32)
ap.add_argument("--b", type=int, default=4)
ap.add_argument("--out", default=str(Path(__file__).parent
                                     / "results/gather_rates.json"))
args = ap.parse_args()

H, W = args.hw
B, C = args.b, args.ch
rng = np.random.default_rng(0)
img = jnp.asarray(rng.uniform(0, 1, (B, H, W, C)).astype(np.float32),
                  jnp.bfloat16)

gy, gx = np.meshgrid(np.arange(H, dtype=np.float32),
                     np.arange(W, dtype=np.float32), indexing="ij")
base = np.stack([gx, gy], -1)[None].repeat(B, 0)  # (B,H,W,2) as (x,y)

# Smooth flow: a few low-frequency sinusoids, +-8 px (typical VFI motion).
yy, xx = np.meshgrid(np.linspace(0, 2 * np.pi, H),
                     np.linspace(0, 2 * np.pi, W), indexing="ij")
smooth_flow = 8.0 * np.stack([np.sin(xx + 0.5 * yy), np.cos(yy - xx)], -1)
coords = {
    "smooth": base + smooth_flow[None].astype(np.float32),
    "random": np.stack([rng.uniform(0, W - 1, (B, H, W)),
                        rng.uniform(0, H - 1, (B, H, W))],
                       -1).astype(np.float32),
    "deform": base + rng.uniform(-8, 8, (B, H, W, 2)).astype(np.float32),
}

rows = B * H * W  # one quad-packed row fetch per query
results = {"shape": f"{B}x{H}x{W}x{C}"}
for name, c in coords.items():
    c = jnp.asarray(c)

    def step(c, img):
        # coords as the chained first arg so iterations can't collapse;
        # epsilon-perturbing coords changes every row index stream.
        return grid_sample(img, c, padding_mode="border")

    s = time_loop(step, (c, img))
    ns_row = s / rows * 1e9
    results[name + "_ns_per_row"] = round(ns_row, 2)
    print(f"{name:<8} {s * 1e3:7.3f} ms  {ns_row:6.2f} ns/row "
          f"({rows} rows)", flush=True)

Path(args.out).parent.mkdir(parents=True, exist_ok=True)
Path(args.out).write_text(json.dumps(results, indent=1))
print(f"wrote {args.out}: {results}")
