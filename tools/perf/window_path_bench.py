"""Measure the windowed deformable-sampling fast path on the real TPU.

Three measurements, all marginal-loop timed (see ``bench.py:time_loop``):

  1. op-level: ``windowed_deformable_sample`` vs ``_grouped_deformable_sample``
     at the flagship's lv1/lv2 shapes (448x256 input);
  2. model-level: flagship forward, ``window_sampling`` on vs off;
  3. optional 720p full-frame with the window path (the gather path OOMs
     full-frame: 24.7 GB lv1 working set, BENCH_NOTES.md).

Usage (ONE TPU process at a time on this host):
  python tools/perf/window_path_bench.py [--ops] [--model] [--hd]
                                         [--q_chunk N]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import numpy as np
import jax
import jax.numpy as jnp

from bench import time_loop


def bench_ops(q_chunk: int):
    from videoframeinterpolation_tpu.nn.deformable_attn import (
        _grouped_deformable_sample,
    )
    from videoframeinterpolation_tpu.ops.windowed import (
        windowed_deformable_sample,
    )

    rng = np.random.default_rng(0)
    # (level name, H, W, G, S, offset_scale) at 448x256 input, 2 frames.
    for name, H, W, G, S, osc in (
        ("lv1", 128, 224, 8, 32, 8.0),
        ("lv2", 64, 112, 8, 16, 4.0),
    ):
        feat = jnp.asarray(
            rng.standard_normal((2, H, W, 72)).astype(np.float32),
            jnp.bfloat16)
        flow = jnp.asarray(
            rng.uniform(-20, 20, (2, H, W, 2)).astype(np.float32))
        res = jnp.asarray(
            rng.uniform(-osc, osc, (2, H, W, G, S, 2)).astype(np.float32),
            jnp.bfloat16)

        # time_loop chains args[1] (flow) through a scalar data dependence.
        def make_win(impl):
            def win_f(feat, flow, res):
                return windowed_deformable_sample(
                    feat, flow, res, G, osc, q_chunk=q_chunk, impl=impl
                ).astype(jnp.float32).sum()
            return win_f

        def gat_f(feat, flow, res):
            off = res.astype(jnp.float32) + flow[:, :, :, None, None, :]
            return _grouped_deformable_sample(feat, off, G).astype(
                jnp.float32).sum()

        for impl in ("slice", "packed"):
            try:
                tw = time_loop(make_win(impl), (feat, flow, res), n_hi=9)
                print(f"{name}: windowed[{impl}] {tw*1e3:8.3f} ms",
                      flush=True)
            except Exception as e:
                print(f"{name}: windowed[{impl}] FAILED "
                      f"{type(e).__name__}: {str(e)[:160]}", flush=True)
        tg = time_loop(gat_f, (feat, flow, res), n_hi=9)
        print(f"{name}: gather {tg*1e3:8.3f} ms", flush=True)


def bench_model(q_chunk: int, hd: bool):
    from videoframeinterpolation_tpu.config import Config
    from videoframeinterpolation_tpu.models import create_model

    shapes = [("448x256", 256, 448)]
    if hd:
        shapes.append(("1280x720", 720, 1280))
    for name, H, W in shapes:
        rng = np.random.default_rng(0)
        x0 = jnp.asarray(rng.uniform(0, 1, (1, H, W, 3)).astype(np.float32))
        x1 = jnp.asarray(rng.uniform(0, 1, (1, H, W, 3)).astype(np.float32))
        t = jnp.full((1, 1, 1, 1), 0.5, jnp.float32)
        for ws in (True, False) if name == "448x256" else (True,):
            cfg = Config(model_name="DATwConstantnCv1",
                         compute_dtype="bfloat16", window_sampling=ws)
            model = create_model(cfg)
            params = model.init(jax.random.key(0), x0[:, :32, :32],
                                x1[:, :32, :32], t)

            def fwd(params, x0, x1, t):
                return model.apply(params, x0, x1, t)

            try:
                sec = time_loop(fwd, (params, x0, x1, t), n_hi=9)
                print(f"DAT {name} window_sampling={ws}: "
                      f"{sec*1e3:8.3f} ms/frame", flush=True)
            except Exception as e:  # OOM expected gather-path full-frame HD
                print(f"DAT {name} window_sampling={ws}: FAILED "
                      f"{type(e).__name__}: {str(e)[:200]}", flush=True)


def bench_train():
    """Training-step (fwd+bwd+loss) latency at the flagship recipe's
    256x256 crop, window path on vs off."""
    from videoframeinterpolation_tpu.config import Config
    from videoframeinterpolation_tpu.models import create_model, dat_loss

    rng = np.random.default_rng(0)
    B, H, W = 8, 256, 256
    batch = {
        "x0": jnp.asarray(rng.uniform(0, 1, (B, H, W, 3)), jnp.float32),
        "x1": jnp.asarray(rng.uniform(0, 1, (B, H, W, 3)), jnp.float32),
        "xt": jnp.asarray(rng.uniform(0, 1, (B, H, W, 3)), jnp.float32),
        "t": jnp.full((B, 1, 1, 1), 0.5, jnp.float32),
        "f0x": jnp.asarray(
            rng.standard_normal((B, H, W, 2)) * 0.02, jnp.float32),
        "f1x": jnp.asarray(
            rng.standard_normal((B, H, W, 2)) * 0.02, jnp.float32),
    }
    for ws in (True, False):
        cfg = Config(model_name="DATwConstantnCv1",
                     compute_dtype="bfloat16", window_sampling=ws)
        model = create_model(cfg)
        params = model.init(jax.random.key(0), batch["x0"][:1],
                            batch["x1"][:1], batch["t"][:1], train=True)

        def loss_fn(params, x0, x1, xt, t, f0x, f1x):
            pred, inter = model.apply(params, x0, x1, t, train=True)
            b = {"xt": xt, "f0x": f0x, "f1x": f1x}
            total, _ = dat_loss(pred, inter, b)
            return total

        # time_loop chains args[1] (x0) through a scalar touching the loss
        # and EVERY parameter gradient (nothing prunable).
        def step(params, x0, x1, xt, t, f0x, f1x):
            loss, g = jax.value_and_grad(loss_fn)(
                params, x0, x1, xt, t, f0x, f1x)
            s = sum(jnp.sum(l.astype(jnp.float32))
                    for l in jax.tree_util.tree_leaves(g))
            return loss + s * 1e-12

        sec = time_loop(step, (params, batch["x0"], batch["x1"],
                               batch["xt"], batch["t"], batch["f0x"],
                               batch["f1x"]), n_hi=5)
        print(f"DAT train fwd+bwd 256x256 b{B} window_sampling={ws}: "
              f"{sec*1e3:8.1f} ms/step", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ops", action="store_true")
    ap.add_argument("--model", action="store_true")
    ap.add_argument("--hd", action="store_true")
    ap.add_argument("--train", action="store_true")
    ap.add_argument("--q_chunk", type=int, default=2048)
    args = ap.parse_args()
    if args.ops:
        bench_ops(args.q_chunk)
    if args.model or args.hd:
        bench_model(args.q_chunk, args.hd)
    if args.train:
        bench_train()


if __name__ == "__main__":
    main()
