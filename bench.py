"""Benchmark: flagship DAT inference latency at Vimeo90K resolution.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Methodology: this environment reaches the TPU through an RPC tunnel with
~25 ms fixed dispatch+fetch overhead, and ``block_until_ready`` does not
reliably fence device execution. We therefore measure *marginal* per-frame
device time: run the forward pass N times inside one jitted ``fori_loop``
(data-dependent chaining so nothing is elided), force completion with a
scalar fetch, and report ``(T(N_hi) - T(N_lo)) / (N_hi - N_lo)``.

Baseline: the reference README's closest published flagship-family number —
DCNDATv1 at 0.048 s/frame on the author's research GPU (README.md:61-63;
the active DATwConstantnCv1 itself has no published latency).
``vs_baseline`` is the speedup factor (baseline_ms / ours_ms; >1 is faster
than the reference).

Headline model: ``configs/DAT_fast.yaml`` — the flagship DAT architecture
with shared sampling offsets and the per-level sample counts shipped in
that YAML (the two gather-row levers; see BENCH_NOTES.md for the ladder). The head-to-head studies (BENCH_NOTES.md) train it
and the exact reference architecture from scratch on byte-identical data
and show near-parity held-out PSNR; the exact-parity model's latency
(152 ms) is documented in BENCH_NOTES.md alongside.
"""

from __future__ import annotations

import json
import time

import numpy as np
import jax
import jax.numpy as jnp

BASELINE_MS = 48.0  # DCNDATv1 0.048 s/frame (README.md:61-63)


def time_loop(forward, args, n_lo: int = 1, n_hi: int = 17, reps: int = 3):
    """Marginal per-iteration device time of ``forward(*args)``.

    ``forward``'s first argument is chained through iterations with an
    epsilon perturbation so the loop cannot be collapsed.
    """

    def make(n):
        @jax.jit
        def f(params, x0, *rest):
            def body(i, c):
                out = forward(params, c, *rest)
                return c + 1e-12 * out
            return jnp.sum(jax.lax.fori_loop(0, n, body, x0))

        return f

    results = []
    for n in (n_lo, n_hi):
        f = make(n)
        float(f(*args))  # compile + warm
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(f(*args))
            ts.append(time.perf_counter() - t0)
        results.append(min(ts))
    return (results[1] - results[0]) / (n_hi - n_lo)


def main() -> None:
    from pathlib import Path

    from videoframeinterpolation_tpu.config import Config
    from videoframeinterpolation_tpu.models import create_model

    # Headline: the shipped fast-flagship config (configs/DAT_fast.yaml) —
    # the flagship DAT architecture with shared sampling offsets at the
    # levels where gather rows dominate. Quality-validated head-to-head
    # against the exact reference architecture on held-out procedural data
    # (BENCH_NOTES.md round-2 study); the exact-parity model's latency is
    # tracked in BENCH_NOTES.md.
    cfg = Config.from_yaml(Path(__file__).parent / "configs" / "DAT_fast.yaml")
    model = create_model(cfg)

    H, W = 256, 448  # Vimeo90K frame size
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.uniform(0, 1, (1, H, W, 3)).astype(np.float32))
    x1 = jnp.asarray(rng.uniform(0, 1, (1, H, W, 3)).astype(np.float32))
    t = jnp.full((1, 1, 1, 1), 0.5, jnp.float32)

    params = model.init(jax.random.key(0), x0[:, :32, :32], x1[:, :32, :32], t)

    def forward(params, x0, x1, t):
        return model.apply(params, x0, x1, t)

    sec = time_loop(forward, (params, x0, x1, t))
    ms = float(sec * 1e3)
    print(json.dumps({
        "metric": "dat_fast_inference_448x256_ms_per_frame",
        "value": round(ms, 3),
        "unit": "ms",
        "vs_baseline": round(BASELINE_MS / ms, 3),
    }))


if __name__ == "__main__":
    main()
