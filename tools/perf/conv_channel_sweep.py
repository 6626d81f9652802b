"""Measure 3x3-conv TF/s vs channel count -> results/conv_ceilings.json.

The roofline (``roofline.py``) prices each convolution by a per-channel
ceiling: a 128x128 MXU runs thin-channel convs at a fraction of peak, and
modeling that fraction is the difference between "mystery MFU gap" and an
attributed number. This sweeps the model-relevant channel counts at a
fixed spatial size (chained convs, marginal-loop timing) and writes the
measured ceilings.

Usage (ONE TPU process at a time):
  python tools/perf/conv_channel_sweep.py [--hw 256 448] [--depth 8]
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

ap = argparse.ArgumentParser()
ap.add_argument("--hw", type=int, nargs=2, default=(256, 448))
ap.add_argument("--depth", type=int, default=8)
ap.add_argument("--channels", type=int, nargs="*",
                default=(8, 16, 24, 32, 48, 72, 96, 128, 192))
ap.add_argument("--out", default=str(Path(__file__).parent
                                     / "results/conv_ceilings.json"))
args = ap.parse_args()

H, W = args.hw
dt = jnp.bfloat16
results = {}
for c in args.channels:
    k = jax.random.key(c)
    ws = [jax.random.normal(jax.random.fold_in(k, i), (3, 3, c, c), dt) * 0.05
          for i in range(args.depth)]
    x = jax.random.normal(jax.random.fold_in(k, 99), (1, H, W, c), dt)

    def step(ws, x):
        # ws passed as the params argument (closure capture would inline
        # the kernels as compile-time constants, CLAUDE.md).
        for w in ws:
            x = jax.lax.conv_general_dilated(
                x, w, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return x

    ms = time_loop(step, (tuple(ws), x)) * 1e3
    flops = 2.0 * args.depth * H * W * c * 9 * c
    tflops = flops / (ms * 1e-3) / 1e12
    results[str(c)] = round(tflops, 2)
    print(f"ch={c:<4} {ms:7.3f} ms  {tflops:6.1f} TF/s", flush=True)

Path(args.out).parent.mkdir(parents=True, exist_ok=True)
Path(args.out).write_text(json.dumps(results, indent=1))
print(f"wrote {args.out}: {results}")
