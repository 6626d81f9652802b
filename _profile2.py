import time, numpy as np, jax, jax.numpy as jnp
from videoframeinterpolation_tpu.nn import SameChannelResEncoder, CrossDeformableAttentionBlock, DCNInterFeatBuilderWithT, BasicResPixelShuffleGenerator

dt = jnp.bfloat16
H, W = 256, 448
rng = np.random.default_rng(0)

def marginal(apply_fn, args, n_hi=9):
    # chain first arg; returns per-iter seconds via scalar-fetch marginal
    def make(n):
        @jax.jit
        def f(*a):
            x = a[0]
            def body(i, x):
                out = apply_fn(x, *a[1:])
                first = out[0] if isinstance(out, tuple) else out
                return x + (1e-12 * jnp.sum(first)).astype(x.dtype)
            x = jax.lax.fori_loop(0, n, body, x)
            return jnp.sum(x.astype(jnp.float32))
        return f
    ts = {}
    for n in (1, n_hi):
        f = make(n)
        float(f(*args))
        best = 1e9
        for _ in range(2):
            t0=time.perf_counter(); float(f(*args)); best=min(best, time.perf_counter()-t0)
        ts[n] = best
    return (ts[n_hi]-ts[1])/(n_hi-1)

x = jnp.asarray(rng.uniform(0,1,(1,H,W,3)).astype(np.float32)).astype(dt)
enc = SameChannelResEncoder(72, 5, dtype=dt)
p = enc.init(jax.random.key(0), x)
print("encoder(1 frame): %.1f ms" % (1e3*marginal(lambda x: enc.apply(p, x)[0], (x,))), flush=True)

f4 = jax.random.normal(jax.random.key(1), (1, H//16, W//16, 72), dt)
qb = DCNInterFeatBuilderWithT(72, dtype=dt)
tt = jnp.full((1,1,1,1), 0.5, dt)
pq = qb.init(jax.random.key(0), f4, f4, tt)
print("query builder (1/16): %.1f ms" % (1e3*marginal(lambda a: qb.apply(pq, a, a, tt), (f4,))), flush=True)

for lvl, (scale, nS, nG, nH, sc, prf) in {3:(8,8,4,4,2.0,True), 2:(4,16,8,8,4.0,True), 1:(2,32,8,8,8.0,False)}.items():
    h, w = H//scale, W//scale
    ft = jax.random.normal(jax.random.key(2), (1,h,w,72), dt)
    fl = jax.random.normal(jax.random.key(3), (1,h,w,2), dt)
    blk = CrossDeformableAttentionBlock(72,72,n_samples=nS,n_groups=nG,n_heads=nH,offset_scale=sc,mlp_ratio=2.0,pred_res_flow=prf,dtype=dt)
    pb = blk.init(jax.random.key(0), ft, ft, ft, fl, fl)
    print("dat_lv%d (%dx%d): %.1f ms" % (lvl, h, w, 1e3*marginal(lambda a: blk.apply(pb, a, a, a, fl, fl), (ft,))), flush=True)

g = BasicResPixelShuffleGenerator(72, 10, dtype=dt)
f1 = jax.random.normal(jax.random.key(4), (1,H//2,W//2,72), dt)
mm = jnp.zeros((1,1,1,1), jnp.float32)
pg = g.init(jax.random.key(0), f1, mm)
print("generator: %.1f ms" % (1e3*marginal(lambda a: g.apply(pg, a, mm), (f1,))), flush=True)
