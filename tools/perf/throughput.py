"""Throughput + HD numbers: frame-pairs/sec/chip at 448x256 (batch) and
720p (spatially tiled) — the BASELINE.md north-star metrics."""
import time

import numpy as np
import jax
import jax.numpy as jnp

import sys
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from bench import time_loop  # noqa: E402
from videoframeinterpolation_tpu.config import Config  # noqa: E402
from videoframeinterpolation_tpu.models import create_model  # noqa: E402


def measure(model_name: str, B: int, H: int, W: int, n_hi: int = 9):
    cfg = Config(model_name=model_name, compute_dtype="bfloat16")
    model = create_model(cfg)
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.uniform(0, 1, (B, H, W, 3)).astype(np.float32))
    x1 = jnp.asarray(rng.uniform(0, 1, (B, H, W, 3)).astype(np.float32))
    t = jnp.full((B, 1, 1, 1), 0.5, jnp.float32)
    params = model.init(jax.random.key(0), x0[:1, :32, :32],
                        x1[:1, :32, :32], t[:1])
    sec = time_loop(lambda p, a, b, tt: model.apply(p, a, b, tt),
                    (params, x0, x1, t), n_hi=n_hi)
    pairs_per_s = B / sec
    print(f"{model_name} {W}x{H} batch={B}: {sec*1e3:.2f} ms/batch "
          f"= {pairs_per_s:.1f} frame-pairs/s/chip", flush=True)
    return pairs_per_s


if __name__ == "__main__":
    # Vimeo90K resolution, batched throughput.
    measure("IFRNet", 4, 256, 448)
    measure("DATwConstantnCv1", 4, 256, 448)
    # 720p single pair (1280x720 -> padded to 1280x720 already /16-divisible
    # in W; H 720 = 45*16 ok).
    measure("IFRNet", 1, 720, 1280, n_hi=5)
    measure("DATwConstantnCTPU", 1, 720, 1280, n_hi=5)
