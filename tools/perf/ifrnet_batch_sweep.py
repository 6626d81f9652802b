"""IFRNet batch-throughput sweep: explain the b8 regression (VERDICT r4 #5).

BENCH_SUITE round 4 measured IFRNet at 403.6 pairs/s/chip (b1) but 277.6
(b8) — a 30% per-frame loss with batch for a dense conv pyramid, which
contradicts the naive roofline (convs should only get MORE efficient with
batch). This probe measures the full batch ladder b=1..16 at 448x256
(marginal-loop timing, chain=2) and attributes the shape of the curve:

  * ``bytes/frame`` from XLA cost analysis (CPU subprocess — fusion
    differs from TPU in detail but the activation-traffic total is the
    right order): constant per frame, so if ms/frame RISES with batch the
    model is crossing from a cache/VMEM-resident regime into HBM-resident
    operands — the same mechanism already measured for the DAT gather
    operands (BENCH_NOTES: ">16 MB cache-resident slice").
  * ``achieved GB/s`` = bytes_per_frame / sec_per_frame, compared against
    the measured elementwise HBM ceiling (``membw_probe.py``): if the b8
    point saturates the ceiling while b1 exceeds it (impossible from HBM
    ⇒ operands were resident on-chip), the regression is attributed.

Emits one JSON line per batch point; run via the TPU queue.
"""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from videoframeinterpolation_tpu.utils.platform import honor_env_platform

honor_env_platform()

import jax
import numpy as np

REPO = Path(__file__).resolve().parents[2]


def cost_bytes(H: int, W: int, B: int) -> float:
    """Forward bytes-accessed via the CPU cost-analysis subprocess."""
    out = subprocess.run(
        [sys.executable, "-c", f"""
import sys
sys.path.insert(0, {str(REPO)!r})
import os
os.environ["JAX_PLATFORMS"] = "cpu"
import jax, jax.numpy as jnp, json
jax.config.update("jax_platforms", "cpu")
from videoframeinterpolation_tpu.config import Config
from videoframeinterpolation_tpu.models import create_model
cfg = Config(model_name="IFRNet", compute_dtype="bfloat16")
m = create_model(cfg)
x = jnp.zeros(({B}, {H}, {W}, 3), jnp.float32)
t = jnp.full(({B}, 1, 1, 1), 0.5, jnp.float32)
p = m.init(jax.random.key(0), x[:1, :32, :32], x[:1, :32, :32], t[:1])
c = jax.jit(lambda p, a, b, t: m.apply(p, a, b, t)).lower(p, x, x, t).compile()
ca = c.cost_analysis()
ca = ca[0] if isinstance(ca, (list, tuple)) else ca
print(json.dumps({{"bytes": ca.get("bytes accessed", -1.0),
                   "flops": ca.get("flops", -1.0)}}))
"""],
        capture_output=True, text=True, timeout=1200)
    if out.returncode != 0:
        raise RuntimeError(out.stderr[-400:])
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    sys.path.insert(0, str(REPO))
    from bench import time_loop  # marginal-loop timing, chain=2

    from videoframeinterpolation_tpu.config import Config
    from videoframeinterpolation_tpu.models import create_model

    import jax.numpy as jnp

    H, W = 256, 448
    cfg = Config(model_name="IFRNet", compute_dtype="bfloat16")
    model = create_model(cfg)
    rng = np.random.default_rng(0)
    x0b = rng.uniform(0, 1, (16, H, W, 3)).astype(np.float32)
    x1b = rng.uniform(0, 1, (16, H, W, 3)).astype(np.float32)
    params = model.init(jax.random.key(0),
                        jnp.asarray(x0b[:1, :32, :32]),
                        jnp.asarray(x1b[:1, :32, :32]),
                        jnp.full((1, 1, 1, 1), 0.5, jnp.float32))

    def forward(params, x0, x1, t):
        return model.apply(params, x0, x1, t)

    for B in (1, 2, 4, 8, 16):
        x0 = jnp.asarray(x0b[:B])
        x1 = jnp.asarray(x1b[:B])
        t = jnp.full((B, 1, 1, 1), 0.5, jnp.float32)
        sec = time_loop(forward, (params, x0, x1, t), n_hi=17, chain=2)
        try:
            ca = cost_bytes(H, W, B)
        except Exception as e:  # attribution is best-effort
            ca = {"bytes": -1.0, "flops": -1.0, "err": repr(e)[:120]}
        ms_frame = sec * 1e3 / B
        rec = {"batch": B, "ms_per_frame": round(ms_frame, 3),
               "pairs_per_s_per_chip": round(1e3 / ms_frame, 1),
               "bytes_per_frame_mb": round(ca["bytes"] / B / 1e6, 1),
               "achieved_gb_s": round(ca["bytes"] / sec / 1e9, 1),
               "flops_per_frame_g": round(ca["flops"] / B / 1e9, 2)}
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
