import time, numpy as np, jax, jax.numpy as jnp
from videoframeinterpolation_tpu.config import Config
from videoframeinterpolation_tpu.models import create_model
from videoframeinterpolation_tpu.nn import SameChannelResEncoder, CrossDeformableAttentionBlock, DCNInterFeatBuilderWithT, BasicResPixelShuffleGenerator

dt = jnp.bfloat16
H, W = 256, 448
rng = np.random.default_rng(0)
def t_of(f, *args, n=20):
    f_j = jax.jit(f)
    f_j(*args)[0].block_until_ready() if isinstance(f_j(*args), tuple) else f_j(*args).block_until_ready()
    ts=[]
    for _ in range(n):
        t0=time.perf_counter()
        r = f_j(*args)
        jax.tree_util.tree_map(lambda x: x.block_until_ready(), r)
        ts.append(time.perf_counter()-t0)
    return np.median(ts)*1e3

x = jnp.asarray(rng.uniform(0,1,(1,H,W,3)).astype(np.float32)).astype(dt)
enc = SameChannelResEncoder(72, 5, dtype=dt)
p = enc.init(jax.random.key(0), x)
print("encoder(1 frame): %.1f ms" % t_of(lambda x: enc.apply(p, x), x))

f4 = jnp.zeros((1, H//16, W//16, 72), dt)
qb = DCNInterFeatBuilderWithT(72, dtype=dt)
tt = jnp.full((1,1,1,1), 0.5, dt)
pq = qb.init(jax.random.key(0), f4, f4, tt)
print("query builder (1/16): %.1f ms" % t_of(lambda a,b: qb.apply(pq, a, b, tt), f4, f4))

for lvl, (hw, nS, nG, nH, sc, prf) in {
    3: (16, 8, 4, 4, 2.0, True),
    2: (8, 16, 8, 8, 4.0, True),
    1: (4, 32, 8, 8, 8.0, False),
}.items():
    h, w = H//hw*2, W//hw*2
    h, w = H//hw, W//hw
    ft = jnp.zeros((1,h,w,72), dt); fl = jnp.zeros((1,h,w,2), dt)
    blk = CrossDeformableAttentionBlock(72,72,n_samples=nS,n_groups=nG,n_heads=nH,offset_scale=sc,mlp_ratio=2.0,pred_res_flow=prf,dtype=dt)
    pb = blk.init(jax.random.key(0), ft, ft, ft, fl, fl)
    print("dat_lv%d (%dx%d): %.1f ms" % (lvl, h, w, t_of(lambda a,b,c,d,e: blk.apply(pb,a,b,c,d,e), ft,ft,ft,fl,fl)))

g = BasicResPixelShuffleGenerator(72, 10, dtype=dt)
f1 = jnp.zeros((1,H//2,W//2,72), dt)
m = jnp.zeros((1,1,1,1), jnp.float32)
pg = g.init(jax.random.key(0), f1, m)
print("generator: %.1f ms" % t_of(lambda a: g.apply(pg, a, m), f1))
