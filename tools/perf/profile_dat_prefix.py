"""Progressive-prefix timing of the DAT forward (params as args).

--shared profiles the shared-offset fast variant (configs/DAT_fast.yaml).
"""
import argparse, time, sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import numpy as np, jax, jax.numpy as jnp
from videoframeinterpolation_tpu.models.dat import DATwConstantnC

_ap = argparse.ArgumentParser()
_ap.add_argument("--shared", action="store_true")
_ap.add_argument("--samples", default=None,
                 help="per-level sample counts 'lv3,lv2,lv1' (default 8,16,32)")
_ap.add_argument("--size", default="256x448",
                 help="input HxW (e.g. 720x1280 for full-frame HD)")
_args = _ap.parse_args()

_samples = (tuple(int(x) for x in _args.samples.split(","))
            if _args.samples else (8, 16, 32))
dt = "bfloat16"
model = DATwConstantnC(nf=72, enc_res_blocks=5, dec_res_blocks=10, mlp_ratio=2.0,
                       shared_offsets=_args.shared, n_samples=_samples,
                       dtype=jnp.bfloat16)
H, W = (int(v) for v in _args.size.split("x"))
rng = np.random.default_rng(0)
x0 = jnp.asarray(rng.uniform(0,1,(1,H,W,3)).astype(np.float32))
x1 = jnp.asarray(rng.uniform(0,1,(1,H,W,3)).astype(np.float32))
t = jnp.full((1,1,1,1),0.5,jnp.float32)
params = model.init(jax.random.key(0), x0[:, :32, :32], x1[:, :32, :32], t)

from videoframeinterpolation_tpu.models.base import norm_w_rgb_mean

def prefix_apply(params, x0, x1, t, stage):
    def run(m):
        nf = m.nf
        x0n, x1n, mean = norm_w_rgb_mean(x0, x1)
        x0n = x0n.astype(jnp.bfloat16); x1n = x1n.astype(jnp.bfloat16)
        feats = m.feature_encoder(jnp.concatenate([x0n, x1n], axis=0))
        B = x0.shape[0]
        (f0_1,f1_1),(f0_2,f1_2),(f0_3,f1_3),(f0_4,f1_4) = ((f[:B],f[B:]) for f in feats)
        if stage == 0:
            return f0_1 + 0*f0_4.sum()+0*f0_2.sum()+0*f0_3.sum() + 0*f1_1
        feat_t_4, ft0_4, ft1_4 = m.coarse_query_builder(f0_4, f1_4, t)
        if stage == 1:
            return feat_t_4
        up3 = m.lv4_to_lv3(jnp.concatenate([feat_t_4, ft0_4, ft1_4], axis=-1))
        feat_t_3 = up3[..., :nf]
        ft0_3, ft1_3 = up3[..., nf:nf+2], up3[..., nf+2:nf+4]
        a3, ft0_2, ft1_2 = m.dat_lv3(feat_t_3, f0_3, f1_3, ft0_3, ft1_3)
        if stage == 2:
            return a3
        q2 = m.lv3_to_lv2(a3)
        a2, ft0_1, ft1_1 = m.dat_lv2(q2, f0_2, f1_2, ft0_2, ft1_2)
        if stage == 3:
            return a2
        q1 = m.lv2_to_lv1(a2)
        a1 = m.dat_lv1(q1, f0_1, f1_1, ft0_1, ft1_1)
        if stage == 4:
            return a1
        return m.pixel_generator(a1, mean)
    return model.apply(params, method=run)

def marginal(stage, n_hi=9):
    def make(n):
        @jax.jit
        def f(params, x0, x1, t):
            def body(i, c):
                out = prefix_apply(params, c, x1, t, stage)
                return c + (1e-12*jnp.sum(out)).astype(c.dtype)
            return jnp.sum(jax.lax.fori_loop(0, n, body, x0).astype(jnp.float32))
        return f
    ts = {}
    for n in (1, n_hi):
        f = make(n)
        float(f(params, x0, x1, t))
        best=1e9
        for _ in range(2):
            t0=time.perf_counter(); float(f(params, x0, x1, t)); best=min(best,time.perf_counter()-t0)
        ts[n]=best
    return (ts[n_hi]-ts[1])/(n_hi-1)

names = ["enc", "+qb", "+lv3", "+lv2", "+lv1", "full"]
prev = 0.0
for s in range(6):
    cur = 1e3*marginal(s)
    print("%5s: cum %.1f ms (delta %.1f)" % (names[s], cur, cur-prev), flush=True)
    prev = cur
