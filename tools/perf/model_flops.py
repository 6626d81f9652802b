"""Forward-pass FLOPs per model via XLA cost analysis (CPU backend).

Run as a subprocess from ``bench.py`` (or standalone) to compute model
FLOPs without touching the tunneled TPU:

  python tools/perf/model_flops.py <config.yaml|model_name> <H> <W> [B]

Prints one JSON line: {"flops": N, "params": N}.

FLOPs come from ``jit(forward).lower(...).compile().cost_analysis()`` —
post-optimization XLA counts. They are computed on the CPU backend (the
counts are backend-portable to first order) so that MFU can be reported
for TPU timings without an extra 3-5 min remote compile per model.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import jax

# Force CPU *after* import (sitecustomize pre-imports jax with the axon
# plugin registered; flipping the platform before first backend use is the
# supported path — same trick as tests/conftest.py).
jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp


def model_flops(config_arg: str, H: int, W: int, B: int = 1) -> dict:
    from videoframeinterpolation_tpu.config import Config
    from videoframeinterpolation_tpu.models import create_model

    if config_arg.endswith((".yaml", ".yml")):
        cfg = Config.from_yaml(Path(config_arg))
    else:
        cfg = Config(model_name=config_arg, compute_dtype="bfloat16")
    model = create_model(cfg)

    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.uniform(0, 1, (B, H, W, 3)).astype(np.float32))
    x1 = jnp.asarray(rng.uniform(0, 1, (B, H, W, 3)).astype(np.float32))
    t = jnp.full((B, 1, 1, 1), 0.5, jnp.float32)
    params = model.init(jax.random.key(0), x0[:1, :32, :32],
                        x1[:1, :32, :32], t[:1])
    n_params = sum(int(x.size) for x in jax.tree_util.tree_leaves(params))

    compiled = jax.jit(
        lambda p, a, b, tt: model.apply(p, a, b, tt)
    ).lower(params, x0, x1, t).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    return {"flops": float(ca["flops"]), "params": n_params}


if __name__ == "__main__":
    cfg_arg = sys.argv[1]
    H, W = int(sys.argv[2]), int(sys.argv[3])
    B = int(sys.argv[4]) if len(sys.argv) > 4 else 1
    print(json.dumps(model_flops(cfg_arg, H, W, B)))
