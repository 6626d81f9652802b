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
HW1 = 129*225  # lv1 quad table rows
# quad-table-like operand: (8, 29025, 36)
img = jax.random.normal(k, (8, HW1, 36), jnp.bfloat16)

for nrows in (28672, 114688, 458752, 917504):
    idx = jax.random.randint(k, (8, nrows), 0, HW1)
    t = marginal(lambda im, ix: jnp.take_along_axis(im, ix[...,None], axis=1), (img, idx))
    print("rows/batch=%d (x8): %.2f ms -> %.2f ns/row" % (nrows, t*1e3, t/(8*nrows)*1e9), flush=True)

# split into S chunks within one jit (same total rows, smaller calls)
idx = jax.random.randint(k, (8, 917504), 0, HW1)
def chunked(im, ix):
    outs = []
    for i in range(32):
        outs.append(jnp.take_along_axis(im, ix[:, i*28672:(i+1)*28672, None], axis=1))
    return jnp.concatenate(outs, axis=1)
t = marginal(chunked, (img, idx))
print("chunked 32x28672 (x8): %.2f ms" % (t*1e3), flush=True)
