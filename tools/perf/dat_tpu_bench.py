import sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parents[2]))
import numpy as np, jax, jax.numpy as jnp
from bench import time_loop
from videoframeinterpolation_tpu.config import Config
from videoframeinterpolation_tpu.models import create_model

cfg = Config(model_name="DATwConstantnCTPU", compute_dtype="bfloat16")
model = create_model(cfg)
rng = np.random.default_rng(0)
x0 = jnp.asarray(rng.uniform(0,1,(1,256,448,3)).astype(np.float32))
x1 = jnp.asarray(rng.uniform(0,1,(1,256,448,3)).astype(np.float32))
t = jnp.full((1,1,1,1),0.5,jnp.float32)
params = model.init(jax.random.key(0), x0[:, :32, :32], x1[:, :32, :32], t)
sec = time_loop(lambda p,a,b,tt: model.apply(p,a,b,tt), (params, x0, x1, t))
print("DAT-TPU 448x256: %.2f ms/frame (reference flagship: 152.5 ms; baseline 48 ms)" % (sec*1e3), flush=True)
