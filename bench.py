"""Benchmark: flagship DAT inference latency at Vimeo90K resolution.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline: the reference README's closest published flagship-family number —
DCNDATv1 at 0.048 s/frame on the author's research GPU (README.md:61-63;
the active DATwConstantnCv1 itself has no published latency).
``vs_baseline`` is the speedup factor (baseline_ms / ours_ms; >1 is faster
than the reference).
"""

from __future__ import annotations

import json
import time

import numpy as np
import jax
import jax.numpy as jnp

BASELINE_MS = 48.0  # DCNDATv1 0.048 s/frame (README.md:61-63)


def main() -> None:
    from videoframeinterpolation_tpu.config import Config
    from videoframeinterpolation_tpu.models import create_model

    cfg = Config(model_name="DATwConstantnCv1", compute_dtype="bfloat16")
    model = create_model(cfg)

    H, W = 256, 448  # Vimeo90K frame size
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.uniform(0, 1, (1, H, W, 3)).astype(np.float32))
    x1 = jnp.asarray(rng.uniform(0, 1, (1, H, W, 3)).astype(np.float32))
    t = jnp.full((1, 1, 1, 1), 0.5, jnp.float32)

    params = model.init(jax.random.key(0), x0[:, :32, :32], x1[:, :32, :32], t)

    @jax.jit
    def forward(x0, x1, t):
        return model.apply(params, x0, x1, t)

    # Warmup / compile.
    forward(x0, x1, t).block_until_ready()

    iters = 50
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        forward(x0, x1, t).block_until_ready()
        times.append(time.perf_counter() - t0)

    ms = float(np.median(times) * 1e3)
    print(json.dumps({
        "metric": "dat_inference_448x256_ms_per_frame",
        "value": round(ms, 3),
        "unit": "ms",
        "vs_baseline": round(BASELINE_MS / ms, 3),
    }))


if __name__ == "__main__":
    main()
