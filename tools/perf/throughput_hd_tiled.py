"""720p flagship inference via the spatially-tiled path (full-frame OOMs:
the lv1 sampling working set at 720p exceeds HBM; tiling is the designed
HD path, parallel/spatial.py)."""
import sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import numpy as np
import jax
import jax.numpy as jnp

from videoframeinterpolation_tpu.config import Config
from videoframeinterpolation_tpu.models import create_model
from videoframeinterpolation_tpu.parallel.spatial import tiled_inference

cfg = Config(model_name="DATwConstantnCv1", compute_dtype="bfloat16")
model = create_model(cfg)
rng = np.random.default_rng(0)
H, W = 720, 1280
x0 = jnp.asarray(rng.uniform(0, 1, (1, H, W, 3)).astype(np.float32))
x1 = jnp.asarray(rng.uniform(0, 1, (1, H, W, 3)).astype(np.float32))
t = jnp.full((1, 1, 1, 1), 0.5, jnp.float32)
params = model.init(jax.random.key(0), x0[:, :32, :32], x1[:, :32, :32], t)

infer = jax.jit(lambda p, a, b, tt: model.apply(p, a, b, tt))
run = lambda: tiled_inference(  # noqa: E731
    lambda a, b, tt: infer(params, a, b, tt), x0, x1, t,
    tile_hw=(256, 256), overlap=64, tile_batch=8)

out = run()
_ = float(jnp.sum(out))  # compile + force
times = []
for _i in range(3):
    t0 = time.perf_counter()
    out = run()
    _ = float(jnp.sum(out))
    times.append(time.perf_counter() - t0)
sec = min(times)
print(f"DAT 1280x720 tiled(256/64): {sec*1e3:.0f} ms/pair "
      f"= {1/sec:.2f} frame-pairs/s/chip (incl host tiling + dispatch)",
      flush=True)
