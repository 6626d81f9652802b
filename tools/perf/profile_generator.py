"""Stage decomposition of the pixel generator at a given size.

The 720p prefix profile attributes ~20.6 ms to the generator
(`BasicResPixelShuffleGenerator`) while its conv FLOPs at the measured
56-60 TF/s roofline cost only ~10.4 ms. This times cumulative prefixes —
res blocks / upconv / pixel-shuffle / PReLU / hrconv / last conv — to
find the non-conv cost (suspects: the half->full-res pixel-shuffle
transpose, full-res activations).

Usage (ONE TPU process at a time):
  python tools/perf/profile_generator.py [--size 360x640] [--nres 10]
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
# (generator class rebuilt inline below)
from videoframeinterpolation_tpu.nn.generator import (
    BasicResPixelShuffleGenerator,
)
from videoframeinterpolation_tpu.nn.blocks import PReLU, ResBlocks, conv
from videoframeinterpolation_tpu.ops import pixel_shuffle

ap = argparse.ArgumentParser()
ap.add_argument("--size", default="360x640",
                help="feature HxW (generator upsamples 2x; 720p = 360x640)")
ap.add_argument("--nf", type=int, default=72)
ap.add_argument("--nres", type=int, default=10)
ap.add_argument("--barrier", action="store_true",
                help="materialize the pixel-shuffled tensor "
                     "(optimization_barrier) instead of letting XLA fuse "
                     "the transpose into every full-res consumer")
ap.add_argument("--deconv", action="store_true",
                help="replace upconv+shuffle with the mathematically "
                     "equivalent stride-2 6x6 transposed conv (subpixel-"
                     "conv identity) — no transpose, native XLA lowering")
args = ap.parse_args()

H, W = (int(v) for v in args.size.split("x"))
nf = args.nf
dt = jnp.bfloat16

k = jax.random.key(0)
feat = jax.random.normal(k, (1, H, W, nf), dt)

STAGES = ["res", "upconv", "shuffle", "prelu1", "hrconv", "prelu2", "last"]


import flax.linen as nn  # noqa: E402


class GenPrefix(nn.Module):
    """Same layer stack as BasicResPixelShuffleGenerator, cut at `stage`.

    Fresh random params per stage — irrelevant for timing.
    """

    stage: int

    @nn.compact
    def __call__(self, feat):
        h = ResBlocks(nf, args.nres, dtype=dt, name="reconstruction")(feat)
        if self.stage == 0:
            return h
        if args.deconv:
            h = nn.ConvTranspose(nf, (6, 6), strides=(2, 2), padding="SAME",
                                 dtype=dt, name="upconv1_t")(h)
            if self.stage in (1, 2):
                return h
        else:
            h = conv(nf * 4, dtype=dt, name="upconv1")(h)
            if self.stage == 1:
                return h
            h = pixel_shuffle(h, 2)
            if args.barrier:
                h = jax.lax.optimization_barrier(h)
            if self.stage == 2:
                return h
        h = PReLU(nf, name="prelu1")(h)
        if self.stage == 3:
            return h
        h = conv(nf, dtype=dt, name="hrconv")(h)
        if self.stage == 4:
            return h
        h = PReLU(nf, name="prelu2")(h)
        if self.stage == 5:
            return h
        return conv(3, dtype=dt, name="conv_last")(h)


prev = 0.0
for s, name in enumerate(STAGES):
    mod = GenPrefix(stage=s)
    params = mod.init(jax.random.key(1), feat)

    def fwd(params, feat, mod=mod):
        out = mod.apply(params, feat)
        # chain back to feat's shape: reduce spatial/channel excess
        return jnp.broadcast_to(
            jnp.mean(out, axis=(1, 2, 3), keepdims=True), feat.shape
        ).astype(feat.dtype)

    sec = time_loop(lambda p, f: fwd(p, f), (params, feat), n_hi=9)
    cur = sec * 1e3
    print(f"{name:8s}: cum {cur:7.2f} ms (delta {cur - prev:+6.2f})",
          flush=True)
    prev = cur
