import time, json
import numpy as np, jax, jax.numpy as jnp
from videoframeinterpolation_tpu.config import Config
from videoframeinterpolation_tpu.models import create_model

cfg = Config(model_name="DATwConstantnCv1", compute_dtype="bfloat16")
model = create_model(cfg)
H, W = 256, 448
rng = np.random.default_rng(0)
x0 = jnp.asarray(rng.uniform(0,1,(1,H,W,3)).astype(np.float32))
x1 = jnp.asarray(rng.uniform(0,1,(1,H,W,3)).astype(np.float32))
t = jnp.full((1,1,1,1),0.5,jnp.float32)
tS = time.perf_counter()
params = model.init(jax.random.key(0), x0[:, :32, :32], x1[:, :32, :32], t)
print("init done %.1fs" % (time.perf_counter()-tS), flush=True)

def forward(x0, x1, t):
    return model.apply(params, x0, x1, t)

def make(n):
    @jax.jit
    def f(x0, x1, t):
        def body(i, c):
            out = forward(c, x1, t)
            return c + 1e-12*out
        return jnp.sum(jax.lax.fori_loop(0, n, body, x0))
    return f

for n in (1, 9):
    f = make(n)
    t0=time.perf_counter(); v=float(f(x0,x1,t)); print("n=%d compile+run %.1fs (v=%g)"%(n,time.perf_counter()-t0,v), flush=True)
    for r in range(3):
        t0=time.perf_counter(); float(f(x0,x1,t)); print("  n=%d run %.3fs"%(n,time.perf_counter()-t0), flush=True)
