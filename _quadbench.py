import time, numpy as np, jax, jax.numpy as jnp
from videoframeinterpolation_tpu.nn.deformable_attn import _grouped_deformable_sample
from videoframeinterpolation_tpu.ops import bwarp

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
        best = 1e9
        for _ in range(2):
            t0=time.perf_counter(); float(f(*args)); best=min(best,time.perf_counter()-t0)
        ts[n]=best
    return (ts[n_hi]-ts[1])/(n_hi-1)

k = jax.random.key(0)
feat = jax.random.normal(k, (1, 128, 224, 72), jnp.bfloat16)
offs = jax.random.normal(k, (1, 128, 224, 8, 32, 2), jnp.bfloat16)*5
print("grouped_sample lv1 (quad): %.1f ms" % (1e3*marginal(lambda f,o: _grouped_deformable_sample(f,o,8), (feat, offs))), flush=True)

img = jax.random.normal(k, (1, 256, 448, 72), jnp.bfloat16)
flow = jax.random.normal(k, (1, 256, 448, 2), jnp.bfloat16)*4
print("bwarp fullres 72ch (quad): %.2f ms" % (1e3*marginal(lambda i,f: bwarp(i,f), (img, flow))), flush=True)
