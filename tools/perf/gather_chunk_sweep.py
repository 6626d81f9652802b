import time, numpy as np, jax, jax.numpy as jnp

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

k = jax.random.key(0)
HW1 = 129*225
# REAL lv1 shapes: both frames batched: (16, 29025, 36) quad table,
# 917504 indices per batch row. Spatially-coherent indices like real offsets.
img = jax.random.normal(k, (16, HW1, 36), jnp.bfloat16)
base = jnp.tile(jnp.arange(0, 28672)[None, :] * (HW1 // 28672), (16, 32))[:, :917504]
jitter = jax.random.randint(k, (16, 917504), -300, 300)
idx = jnp.clip(base + jitter, 0, HW1-1).astype(jnp.int32)

def chunked(chunk):
    def f(im, ix):
        outs = []
        N = ix.shape[1]
        for i in range(0, N, chunk):
            outs.append(jnp.take_along_axis(im, ix[:, i:i+chunk, None], axis=1))
        return jnp.concatenate(outs, axis=1)
    return f

for chunk in (917504, 65536, 16384, 4096):
    t = marginal(chunked(chunk), (img, idx))
    print("chunk=%d (%d rows/call): %.1f ms (%.2f ns/row)" % (
        chunk, chunk*16, t*1e3, t/(16*917504)*1e9), flush=True)
