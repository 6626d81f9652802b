import sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parents[2]))
import numpy as np, jax, jax.numpy as jnp
from videoframeinterpolation_tpu.kernels.window_sample import windowed_deformable_sample
from videoframeinterpolation_tpu.nn.deformable_attn import _grouped_deformable_sample

k = jax.random.key(0)
B2, H, W, G, S, C, sc = 2, 128, 224, 8, 32, 72, 8.0
feat = jax.random.normal(k, (B2, H, W, C), jnp.bfloat16)
flow = jax.random.normal(k, (B2, H, W, 2), jnp.bfloat16) * 3
residual = (jax.random.uniform(k, (B2, H, W, G, S, 2), jnp.float32) * 2 - 1) * (sc * 0.999)
residual = residual.astype(jnp.bfloat16)

# correctness on-device vs XLA path
t0 = time.perf_counter()
out = windowed_deformable_sample(feat, flow, residual, G, sc)
ov = np.asarray(out)
print("pallas compile+run %.0fs" % (time.perf_counter()-t0), flush=True)
ref = np.asarray(_grouped_deformable_sample(
    feat, residual + flow[:, :, :, None, None, :], G))
err = np.abs(ov.astype(np.float32) - ref.astype(np.float32))
print("max abs err vs XLA:", err.max(), " mean:", err.mean(), flush=True)

def marginal(fn, args, n_hi=9):
    def make(n):
        @jax.jit
        def f(*a):
            x = a[0]
            def body(i, x):
                out = fn(x, *a[1:])
                return x + (1e-12*jnp.sum(out)).astype(x.dtype)
            return jnp.sum(jax.lax.fori_loop(0, n, body, x).astype(jnp.float32))
        return f
    ts = {}
    for n in (1, n_hi):
        f = make(n)
        float(f(*args))
        best=1e9
        for _ in range(2):
            t0=time.perf_counter(); float(f(*args)); best=min(best,time.perf_counter()-t0)
        ts[n]=best
    return (ts[n_hi]-ts[1])/(n_hi-1)

t = marginal(lambda f, fl, r: windowed_deformable_sample(f, fl, r, G, sc),
             (feat, flow, residual))
print("windowed lv1 sampling: %.1f ms" % (t*1e3), flush=True)
t = marginal(lambda f, fl, r: _grouped_deformable_sample(
    f, r + fl[:, :, :, None, None, :], G), (feat, flow, residual))
print("XLA lv1 sampling:      %.1f ms" % (t*1e3), flush=True)
