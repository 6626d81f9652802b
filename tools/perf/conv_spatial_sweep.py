"""Does 3x3-conv throughput degrade with spatial size on this stack?

The 720p prefix profile (tools/perf/README.md) shows the pure-conv stages
(encoder, generator) running ~1.5-1.8x past linear pixel scaling, i.e.
effective conv throughput drops from ~44 TF/s at 448x256 to ~29 TF/s at
720p. This sweeps a chain of 3x3 convs (nf channels, NHWC, bf16 — the
flagship's exact op shape) across spatial sizes to separate compiler /
layout effects from model-level causes.

Usage (ONE TPU process at a time):
  python tools/perf/conv_spatial_sweep.py [--nf 72] [--depth 8] [--prelu]
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
ap.add_argument("--nf", type=int, default=72)
ap.add_argument("--depth", type=int, default=8)
ap.add_argument("--prelu", action="store_true",
                help="interleave PReLU (the generator's activation)")
ap.add_argument("--prelu_impl", default="where",
                choices=["where", "minmax", "relu2", "abs"],
                help="PReLU formulation: where = jnp.where(x>=0,x,a*x); "
                     "minmax = max(x,0)+a*min(x,0); "
                     "relu2 = relu(x)-a*relu(-x); "
                     "abs = 0.5*((1+a)*x + (1-a)*|x|)")
ap.add_argument("--batch", type=int, default=2,
                help="2 = both frames through shared weights, the model's "
                     "hot-path batch")
args = ap.parse_args()

nf, depth = args.nf, args.depth
dt = jnp.bfloat16

k = jax.random.key(0)
ws = [jax.random.normal(jax.random.fold_in(k, i), (3, 3, nf, nf), dt) * 0.05
      for i in range(depth)]
alpha = jnp.full((nf,), 0.25, dt)


def chain(ws, x):
    for w in ws:
        x = jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if args.prelu:
            if args.prelu_impl == "where":
                x = jnp.where(x >= 0, x, alpha * x)
            elif args.prelu_impl == "minmax":
                x = jnp.maximum(x, 0) + alpha * jnp.minimum(x, 0)
            elif args.prelu_impl == "relu2":
                x = jnp.maximum(x, 0) - alpha * jnp.maximum(-x, 0)
            else:  # abs
                x = 0.5 * ((1 + alpha) * x + (1 - alpha) * jnp.abs(x))
        else:
            x = jnp.maximum(x, 0)
    return x


SIZES = [(128, 224), (256, 448), (360, 640), (512, 896), (720, 1280)]
for H, W in SIZES:
    x = jax.random.normal(jax.random.fold_in(k, 99), (args.batch, H, W, nf), dt)
    sec = time_loop(lambda ws, x: chain(ws, x), (ws, x), n_hi=9)
    flops = args.batch * depth * 2 * 9 * nf * nf * H * W
    print(f"{H}x{W} b{args.batch} nf{nf} depth{depth}"
          f"{' prelu' if args.prelu else ''}: {sec * 1e3:8.3f} ms "
          f"= {flops / sec / 1e12:6.1f} TF/s", flush=True)
