"""720p throughput on the real TPU (BASELINE.md north-star metric).

  python tools/perf/throughput_hd_tiled.py --model DATwConstantnCv1 \
      [--mode tiled|full] [--tile 256] [--overlap 64] [--tile_batch 8]

``tiled`` runs the whole sweep as ONE compiled program
(``parallel/spatial.py:make_tiled_infer``); round 1's host-orchestrated
loop paid ~25 ms tunnel dispatch per tile chunk.
"""
import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import numpy as np
import jax
import jax.numpy as jnp

from videoframeinterpolation_tpu.config import Config
from videoframeinterpolation_tpu.models import create_model
from videoframeinterpolation_tpu.parallel.spatial import make_tiled_infer

ap = argparse.ArgumentParser()
ap.add_argument("--model", default="DATwConstantnCv1")
ap.add_argument("--mode", default="tiled", choices=["tiled", "full"])
ap.add_argument("--tile", type=int, default=256)
ap.add_argument("--overlap", type=int, default=64)
ap.add_argument("--tile_batch", type=int, default=8)
ap.add_argument("--height", type=int, default=720)
ap.add_argument("--width", type=int, default=1280)
ap.add_argument("--reps", type=int, default=3)
ap.add_argument("--window_sampling", action="store_true",
                help="flagship exact-parity windowed sampling fast path")
ap.add_argument("--shared", action="store_true",
                help="shared-offset fast flagship (configs/DAT_fast.yaml)")
ap.add_argument("--samples", default=None,
                help="per-level sample counts 'lv3,lv2,lv1' (e.g. 8,8,2)")
args = ap.parse_args()

samples = (tuple(int(x) for x in args.samples.split(","))
           if args.samples else (8, 16, 32))
cfg = Config(model_name=args.model, compute_dtype="bfloat16",
             window_sampling=args.window_sampling,
             shared_offsets=args.shared, dat_samples=list(samples))
model = create_model(cfg)
rng = np.random.default_rng(0)
H, W = args.height, args.width
x0 = jnp.asarray(rng.uniform(0, 1, (1, H, W, 3)).astype(np.float32))
x1 = jnp.asarray(rng.uniform(0, 1, (1, H, W, 3)).astype(np.float32))
t = jnp.full((1, 1, 1, 1), 0.5, jnp.float32)
params = model.init(jax.random.key(0), x0[:, :32, :32], x1[:, :32, :32], t)


def apply_fn(p, a, b, tt):
    return model.apply(p, a, b, tt)


if args.mode == "tiled":
    fn = make_tiled_infer(apply_fn, tile_hw=(args.tile, args.tile),
                          overlap=args.overlap, tile_batch=args.tile_batch)
else:
    fn = jax.jit(apply_fn)

out = fn(params, x0, x1, t)
_ = float(jnp.sum(out))  # compile + force
times = []
for _i in range(args.reps):
    t0 = time.perf_counter()
    out = fn(params, x0, x1, t)
    _ = float(jnp.sum(out))
    times.append(time.perf_counter() - t0)
best = min(times)
tag = " window" if args.window_sampling else ""
if args.shared:
    tag += f" shared{samples}"
print(f"{args.model}{tag} {args.mode} {H}x{W}: {best*1e3:.1f} ms/pair "
      f"= {1.0/best:.2f} pairs/s/chip (reps: "
      + ", ".join(f"{x*1e3:.0f}" for x in times) + ")")
