"""Intra-block profile of dat_lv1: movement / offsets / sampling / attention.

--shared / --samples N profile the fast-flagship variant (configs/DAT_fast.yaml
ships --shared --samples 4 at lv1).
"""
import argparse, sys, time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import numpy as np, jax, jax.numpy as jnp
from videoframeinterpolation_tpu.nn.deformable_attn import (
    CrossDeformableAttentionBlock, _grouped_deformable_sample)

_ap = argparse.ArgumentParser()
_ap.add_argument("--shared", action="store_true")
_ap.add_argument("--samples", type=int, default=32)
_ap.add_argument("--size", default="128x224",
                 help="lv1 feature HxW (720p full-frame lv1 = 360x640)")
_args = _ap.parse_args()

dt = jnp.bfloat16
H, W = (int(v) for v in _args.size.split("x"))
blk = CrossDeformableAttentionBlock(72, 72, n_samples=_args.samples,
                                    n_groups=8, n_heads=8,
                                    offset_scale=8.0, mlp_ratio=2.0,
                                    shared_offsets=_args.shared,
                                    pred_res_flow=False, dtype=dt)
k = jax.random.key(0)
ft = jax.random.normal(k, (1, H, W, 72), dt)
fl = jax.random.normal(k, (1, H, W, 2), dt) * 3
params = blk.init(jax.random.key(1), ft, ft, ft, fl, fl)

def stage_apply(params, feat_t, stage):
    def run(m):
        B = feat_t.shape[0]
        feat_b = jnp.concatenate([feat_t, feat_t], axis=0)
        ft_b = jnp.concatenate([fl, fl], axis=0)
        feat_t_b = jnp.concatenate([feat_t, feat_t], axis=0)
        mv_b = m._movement_feats(feat_t_b, feat_b, ft_b)
        if stage == 0:
            return mv_b
        off_b = m._ref_offsets(ft_b, mv_b)
        if stage == 1:
            return off_b
        kv_b = _grouped_deformable_sample(feat_b, off_b, m.n_offset_sets)
        if stage == 2:
            return kv_b
        attended = m.attn(feat_t, jnp.concatenate([kv_b[:B], kv_b[B:]], axis=1))
        if stage == 3:
            return attended
        return attended + m.mlp(attended)
    return blk.apply(params, method=run)

def marginal(stage, n_hi=9):
    def make(n):
        @jax.jit
        def f(params, x):
            def body(i, c):
                out = stage_apply(params, c, stage)
                return c + (1e-12*jnp.sum(out)).astype(c.dtype)
            return jnp.sum(jax.lax.fori_loop(0, n, body, x).astype(jnp.float32))
        return f
    ts = {}
    for n in (1, n_hi):
        f = make(n)
        float(f(params, ft))
        best = 1e9
        for _ in range(2):
            t0=time.perf_counter(); float(f(params, ft)); best=min(best, time.perf_counter()-t0)
        ts[n] = best
    return (ts[n_hi]-ts[1])/(n_hi-1)

names = ["movement", "+offsets", "+sampling", "+attn", "+mlp"]
prev = 0.0
for s in range(5):
    cur = 1e3*marginal(s)
    print("%9s: cum %.1f ms (delta %.1f)" % (names[s], cur, cur-prev), flush=True)
    prev = cur
