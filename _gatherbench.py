import time, numpy as np, jax, jax.numpy as jnp
from functools import partial

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
BG, HW, Cg, S = 8, 128*224, 9, 32
N = S*HW

img = jax.random.normal(k, (BG, HW, Cg), jnp.bfloat16)
idx = jax.random.randint(k, (BG, N), 0, HW)

# (a) take_along_axis row gather (current)
def a(img, idx):
    return jnp.take_along_axis(img, idx[..., None], axis=1)
print("a take_along rows (8,917504)x9ch: %.1f ms" % (1e3*marginal(a, (img, idx))), flush=True)

# (d) one flat gather
img_flat = img.reshape(BG*HW, Cg)
gidx = (idx + (jnp.arange(BG)*HW)[:, None]).reshape(-1)
def d(img_flat, gidx):
    return jnp.take(img_flat, gidx, axis=0)
print("d flat take: %.1f ms" % (1e3*marginal(d, (img_flat, gidx))), flush=True)

# (c) minor-dim gather: operand (BG, Cg, HW), idx (BG, Cg, N)
imgT = img.transpose(0,2,1)
idxT = jnp.broadcast_to(idx[:, None, :], (BG, Cg, N))
def c(imgT, idxT):
    return jnp.take_along_axis(imgT, idxT, axis=2)
print("c minor-dim take: %.1f ms" % (1e3*marginal(c, (imgT, idxT))), flush=True)

# (e) dense bwarp-like gather: only HW queries, full 72 ch
img72 = jax.random.normal(k, (1, HW, 72), jnp.bfloat16)
idx1 = jax.random.randint(k, (1, HW), 0, HW)
def e(img72, idx1):
    return jnp.take_along_axis(img72, idx1[..., None], axis=1)
print("e dense 28672x72ch: %.2f ms" % (1e3*marginal(e, (img72, idx1))), flush=True)

# (f) full grid_sample (4 taps + weights) at lv1 config
from videoframeinterpolation_tpu.nn.deformable_attn import _grouped_deformable_sample
feat = jax.random.normal(k, (1, 128, 224, 72), jnp.bfloat16)
offs = jax.random.normal(k, (1, 128, 224, 8, 32, 2), jnp.bfloat16)*5
def f(feat, offs):
    return _grouped_deformable_sample(feat, offs, 8)
print("f grouped_sample lv1: %.1f ms" % (1e3*marginal(f, (feat, offs))), flush=True)
