"""Measure effective HBM copy bandwidth -> results/membw.json.

The roofline prices elementwise/other ops at HBM bandwidth; v5e nominal
is 819 GB/s but the achievable streaming rate (and whatever the tunnel
runtime layers on top) is what matters. Times a big out-of-place
elementwise op (read N bytes + write N bytes) with the marginal-loop
method.

Usage (ONE TPU process at a time):
  python tools/perf/membw_probe.py [--mb 256]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import jax
import jax.numpy as jnp

from bench import time_loop

ap = argparse.ArgumentParser()
ap.add_argument("--mb", type=int, default=256)
ap.add_argument("--out", default=str(Path(__file__).parent
                                     / "results/membw.json"))
args = ap.parse_args()

n = args.mb * 1024 * 1024 // 4
x = jax.random.normal(jax.random.key(0), (n,), jnp.float32)


def step(params, x):
    return x * 1.0000001 + params


s = time_loop(step, (jnp.float32(1e-9), x))
gbps = 2.0 * n * 4 / s / 1e9  # read + write
print(f"{args.mb} MB elementwise: {s * 1e3:.3f} ms -> {gbps:.0f} GB/s")
Path(args.out).parent.mkdir(parents=True, exist_ok=True)
Path(args.out).write_text(json.dumps({"gbps": round(gbps, 1),
                                      "mb": args.mb}))
print(f"wrote {args.out}")
