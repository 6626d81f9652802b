"""Direct multi-instant serving vs per-frame dispatch (flagship).

``interpolate.py --mode direct`` decodes every interpolation instant of
a pair inside one program with the t-invariant encoder shared
(``models/base.py:multi_t_apply``). This probe prices that on the real
TPU at 448x256: marginal per-pair cost of the 3-instant program vs 3x
the single-instant cost (both honestly chained, bench.py ``chain=2``).

  python tools/perf/multi_t_bench.py [--size 256x448] [--n 3]

Writes results to tools/perf/results/multi_t.json.
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path
import sys

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import numpy as np

from bench import time_loop  # noqa: E402  (honor_env_platform runs there)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="256x448")
    ap.add_argument("--n", type=int, default=3,
                    help="instants per pair (factor - 1)")
    ap.add_argument("--config", default="configs/DAT_fast.yaml")
    ap.add_argument("--n_hi", type=int, default=9)
    args = ap.parse_args()
    H, W = (int(x) for x in args.size.split("x"))

    from videoframeinterpolation_tpu.config import Config
    from videoframeinterpolation_tpu.models import create_model, multi_t_apply

    repo = Path(__file__).resolve().parents[2]
    cfg = Config.from_yaml(repo / args.config)
    model = create_model(cfg)
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.uniform(0, 1, (1, H, W, 3)).astype(np.float32))
    x1 = jnp.asarray(rng.uniform(0, 1, (1, H, W, 3)).astype(np.float32))
    t = jnp.full((1, 1, 1, 1), 0.5, jnp.float32)
    params = model.init(jax.random.key(0), x0[:, :32, :32], x1[:, :32, :32],
                        t)

    def single(p, a, b, tt):
        return model.apply(p, a, b, tt)

    sec_single = time_loop(single, (params, x0, x1, t), n_hi=args.n_hi,
                           chain=2)

    ts = tuple((i + 1) / (args.n + 1) for i in range(args.n))

    def direct(p, a, b):
        # collapse the (n, B, H, W, 3) stack so the carry matches a/b
        return jnp.mean(multi_t_apply(model, p, a, b, ts), axis=0)

    sec_direct = time_loop(direct, (params, x0, x1), n_hi=args.n_hi,
                           chain=2)

    rec = {
        "size": f"{H}x{W}", "n_instants": args.n,
        "single_ms_per_frame": round(sec_single * 1e3, 3),
        "direct_ms_per_pair": round(sec_direct * 1e3, 3),
        "direct_ms_per_frame": round(sec_direct * 1e3 / args.n, 3),
        "speedup_per_frame": round(sec_single * args.n / sec_direct, 3),
    }
    print(json.dumps(rec), flush=True)
    out = Path(__file__).parent / "results" / "multi_t.json"
    out.parent.mkdir(exist_ok=True)
    out.write_text(json.dumps(rec, indent=1) + "\n")


if __name__ == "__main__":
    main()
