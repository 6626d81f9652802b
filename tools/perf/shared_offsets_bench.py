"""Latency/throughput of the shared-offset flagship variant on the real TPU.

``shared_offsets=True`` keeps the flagship architecture (learned sparse
tanh-bounded offsets, same attention/losses/pyramid) but learns ONE offset
set per DAT level instead of one per channel group, cutting sampler gather
rows by ``n_groups`` (8x at lv1) — the measured cost model says rows are
everything (``tools/perf/README.md``). Quality is measured head-to-head in
``tools/quality/head_to_head.py --shared``.

Usage (ONE TPU process at a time):
  python tools/perf/shared_offsets_bench.py [--hd] [--batch4]
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

_STRIDE = 1  # lv1 query-grid stride (set by --attn_stride)


def bench(shapes, batch_sizes, shared_vals, samples=(8, 16, 32),
          movement_nf=None):
    from videoframeinterpolation_tpu.config import Config
    from videoframeinterpolation_tpu.models import create_model

    for name, H, W in shapes:
        for B in batch_sizes:
            rng = np.random.default_rng(0)
            x0 = jnp.asarray(
                rng.uniform(0, 1, (B, H, W, 3)).astype(np.float32))
            x1 = jnp.asarray(
                rng.uniform(0, 1, (B, H, W, 3)).astype(np.float32))
            t = jnp.full((B, 1, 1, 1), 0.5, jnp.float32)
            for so in shared_vals:
                cfg = Config(model_name="DATwConstantnCv1",
                             compute_dtype="bfloat16", shared_offsets=so,
                             dat_samples=samples,
                             dat_attn_stride=(1, 1, _STRIDE),
                             dat_movement_nf=movement_nf)
                model = create_model(cfg)
                params = model.init(jax.random.key(0), x0[:1, :32, :32],
                                    x1[:1, :32, :32], t[:1])

                def fwd(params, x0, x1, t):
                    return model.apply(params, x0, x1, t)

                try:
                    sec = time_loop(fwd, (params, x0, x1, t), n_hi=9)
                    ms = sec * 1e3
                    print(f"DAT {name} b{B} shared_offsets={so} "
                          f"samples={samples}: "
                          f"{ms:8.3f} ms/batch = {ms/B:7.3f} ms/frame",
                          flush=True)
                except Exception as e:
                    print(f"DAT {name} b{B} shared_offsets={so} "
                          f"samples={samples}: FAILED "
                          f"{type(e).__name__}: {str(e)[:200]}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hd", action="store_true")
    ap.add_argument("--batch4", action="store_true")
    ap.add_argument("--levels", default=None,
                    help="comma list of DAT levels with shared offsets "
                         "(e.g. '2,1' = share lv2+lv1, keep per-group "
                         "offsets at lv3); default: share all levels")
    ap.add_argument("--samples", default=None,
                    help="per-level sample counts 'lv3,lv2,lv1' "
                         "(default 8,16,32)")
    ap.add_argument("--attn_stride", type=int, default=1,
                    help="lv1 query-grid stride (2 = strided lv1 block)")
    ap.add_argument("--movement_nf", default=None,
                    help="movement-extractor width per level 'lv3,lv2,lv1'")
    args = ap.parse_args()
    global _STRIDE
    _STRIDE = args.attn_stride

    if args.levels:
        lv = {int(x) for x in args.levels.split(",")}
        shared = tuple(l in lv for l in (3, 2, 1))
    else:
        shared = True
    samples = (tuple(int(x) for x in args.samples.split(","))
               if args.samples else (8, 16, 32))
    mv = (tuple(int(x) for x in args.movement_nf.split(","))
          if args.movement_nf else None)

    shapes = [("448x256", 256, 448)]
    bench(shapes, [1], [shared], samples, mv)
    if args.batch4:
        bench(shapes, [4], [shared], samples, mv)
    if args.hd:
        bench([("1280x720", 720, 1280)], [1], [shared], samples, mv)


if __name__ == "__main__":
    main()
