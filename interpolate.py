"""Inference CLI: interpolate between two frames (or upsample a sequence).

Capabilities beyond the reference's eval scripts:
  * arbitrary interpolation instant ``--t`` (the models are t-conditioned);
  * ``--factor N`` frame-rate upsampling of an image sequence — recursive
    (t=0.5 halving levels) or ``--mode direct``: every intermediate
    instant from the original pair in ONE device dispatch, encoder shared
    across instants (staged encode/decode models; any integer factor);
  * spatially-tiled inference for HD/4K inputs (``--tile``), in both
    single-pair and sequence modes — direct mode decodes every instant
    inside each tile's program, with the seam-safety overlap inflated to
    cover instants near 0/1 sampling the full pair motion.

Quality guidance for off-center instants (measured, BENCH_NOTES round-5
per-instant table): checkpoints trained at the reference's fixed t=0.5
degrade symmetrically away from the center — -10 dB PSNR at t=1/8 and
7/8 on the factor-8 grid — so ``--mode direct`` with the shipped recipe
is only quality-validated at t=0.5. For direct multi-instant serving,
train with ``random_t`` spanning the served grid (e.g.
``tools/quality/head_to_head.py --random_t 0.125,0.875``), which costs
~2 dB at the center instant but covers the grid; otherwise prefer the
default recursive mode, which decodes every frame at the validated
t=0.5.

Usage:
  python interpolate.py --config configs/DAT.yaml --ckpt <name> \
      --frame0 a.png --frame1 b.png --out out.png [--t 0.5] [--tile 512]
  python interpolate.py ... --in_dir frames/ --out_dir out/ --factor 2
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np


def _load_model(args):
    from videoframeinterpolation_tpu.utils.platform import honor_env_platform

    honor_env_platform()

    import jax
    import jax.numpy as jnp

    from videoframeinterpolation_tpu.config import Config
    from videoframeinterpolation_tpu.models import create_model
    from videoframeinterpolation_tpu.train.checkpoint import CheckpointManager
    from videoframeinterpolation_tpu.train.state import create_train_state

    cfg = Config.from_yaml(args.config, exp_name=args.exp_name or "infer")
    if getattr(args, "window_sampling", False):
        cfg.window_sampling = True
    model = create_model(cfg)
    dummy = jnp.zeros((1, 32, 32, 3), jnp.float32)
    t = jnp.full((1, 1, 1, 1), 0.5, jnp.float32)
    params = model.init(jax.random.key(0), dummy, dummy, t)
    if args.ckpt:
        state = create_train_state(model, params, cfg)
        state, _ = CheckpointManager(cfg.log_dir).restore(args.ckpt, state)
        params = state.params

    from videoframeinterpolation_tpu.parallel.spatial import (
        make_flow_aware_tiled,
    )

    def apply_fn(p, x0, x1, t):
        return model.apply(p, x0, x1, t)

    # Params stay explicit arguments (closure capture would inline them as
    # compile-time constants); tiling runs as ONE compiled program.
    if args.tile:
        # Flow-aware tiling: overlap/trim sized per pair from the model's
        # own low-res flow estimate (VERDICT round-2 gap #3). Small frames
        # route to the full-frame program automatically.
        infer = make_flow_aware_tiled(
            apply_fn, params, args.tile,
            train_apply_fn=lambda p, a, b, tt, train: model.apply(
                p, a, b, tt, train=train),
        )
        return infer, model, params

    infer_jit = jax.jit(apply_fn)
    return (lambda x0, x1, t: infer_jit(params, x0, x1, t)), model, params


def _interp_pair(infer, img0, img1, t_val):
    import jax.numpy as jnp

    from videoframeinterpolation_tpu.data import InputPadder

    x0 = jnp.asarray(img0.astype(np.float32) / 255.0)[None]
    x1 = jnp.asarray(img1.astype(np.float32) / 255.0)[None]
    t = jnp.full((1, 1, 1, 1), t_val, jnp.float32)

    padder = InputPadder(x0.shape, divisor=16)
    x0p, x1p = padder.pad(x0, x1)
    pred = padder.unpad(infer(x0p, x1p, t))
    return (np.clip(np.asarray(pred[0]), 0, 1) * 255).astype(np.uint8)


def _interp_pair_direct(multi_infer, img0, img1):
    """All of a pair's intermediate frames from one device dispatch."""
    import jax.numpy as jnp

    from videoframeinterpolation_tpu.data import InputPadder

    x0 = jnp.asarray(img0.astype(np.float32) / 255.0)[None]
    x1 = jnp.asarray(img1.astype(np.float32) / 255.0)[None]
    padder = InputPadder(x0.shape, divisor=16)
    x0p, x1p = padder.pad(x0, x1)
    preds = np.asarray(multi_infer(x0p, x1p))  # (n_mid, 1, Hp, Wp, 3)
    out = []
    for k in range(preds.shape[0]):
        pred = padder.unpad(preds[k])
        out.append((np.clip(np.asarray(pred[0]), 0, 1) * 255).astype(np.uint8))
    return out


def main() -> None:
    parser = argparse.ArgumentParser(description="TPU-native VFI inference")
    parser.add_argument("--config", required=True)
    parser.add_argument("--exp_name", default=None)
    parser.add_argument("--ckpt", default=None)
    parser.add_argument("--frame0")
    parser.add_argument("--frame1")
    parser.add_argument("--out")
    parser.add_argument("--t", type=float, default=0.5)
    parser.add_argument("--in_dir", help="sequence mode: input frame dir")
    parser.add_argument("--out_dir", help="sequence mode: output dir")
    parser.add_argument("--factor", type=int, default=2,
                        help="sequence mode: frame-rate multiplier "
                             "(recursive mode: power of 2; direct: any)")
    parser.add_argument("--mode", choices=["recursive", "direct"],
                        default="recursive",
                        help="sequence upsampling strategy. recursive: "
                        "t=0.5 halving levels (later levels interpolate "
                        "generated frames). direct: all factor-1 instants "
                        "from the ORIGINAL pair in ONE device dispatch — "
                        "the t-invariant encoder runs once per pair (no "
                        "error compounding; needs a staged encode/decode "
                        "model, e.g. the DAT flagship)")
    parser.add_argument("--window_sampling", action="store_true",
                        help="exact-parity windowed sampling fast path "
                        "(same params -- any flagship checkpoint works)")
    parser.add_argument("--tile", type=int, default=0,
                        help="spatial tile size for HD/4K inputs (0 = off)")
    args = parser.parse_args()

    # cheap argument validation before the (slow) model load
    if args.in_dir:
        if args.mode == "recursive" and args.factor & (args.factor - 1):
            raise SystemExit("--mode recursive needs a power-of-2 --factor; "
                             f"use --mode direct for factor {args.factor}")
        if args.mode == "direct" and args.factor < 2:
            # factor 1 would build an empty instant tuple and crash inside
            # multi_t_apply's jnp.stack([]) after the slow model load.
            raise SystemExit("--mode direct needs --factor >= 2 "
                             "(factor 1 inserts no frames)")

    import imageio.v2 as imageio

    infer, model, params = _load_model(args)

    if args.in_dir:
        frames = sorted(Path(args.in_dir).iterdir())
        out_dir = Path(args.out_dir or "interp_out")
        out_dir.mkdir(parents=True, exist_ok=True)
        seq = [imageio.imread(f) for f in frames]
        if args.mode == "direct":
            if not hasattr(model, "encode"):
                raise SystemExit(
                    f"--mode direct needs a staged encode/decode model; "
                    f"{type(model).__name__} has none — use "
                    f"--mode recursive")
            import jax

            from videoframeinterpolation_tpu.models import multi_t_apply

            ts = tuple((i + 1) / args.factor for i in range(args.factor - 1))

            def multi_apply(p, a, b):
                return multi_t_apply(model, p, a, b, ts)

            if args.tile:
                from videoframeinterpolation_tpu.parallel.spatial import (
                    make_flow_aware_multi_t,
                )

                multi_infer = make_flow_aware_multi_t(
                    multi_apply, params, args.tile, ts,
                    train_apply_fn=lambda p, a, b, tt, train: model.apply(
                        p, a, b, tt, train=train),
                )
            else:
                multi_jit = jax.jit(multi_apply)
                multi_infer = lambda x0, x1: multi_jit(params, x0, x1)
            out = []
            for a, b in zip(seq[:-1], seq[1:]):
                out.append(a)
                out.extend(_interp_pair_direct(multi_infer, a, b))
            out.append(seq[-1])
            seq = out
        else:
            levels = int(np.log2(args.factor))
            for _ in range(levels):
                out = []
                for a, b in zip(seq[:-1], seq[1:]):
                    out.append(a)
                    out.append(_interp_pair(infer, a, b, 0.5))
                out.append(seq[-1])
                seq = out
        for i, fr in enumerate(seq):
            imageio.imwrite(out_dir / f"{i:06d}.png", fr)
        print(f"wrote {len(seq)} frames to {out_dir}")
    else:
        assert args.frame0 and args.frame1 and args.out
        img0 = imageio.imread(args.frame0)
        img1 = imageio.imread(args.frame1)
        pred = _interp_pair(infer, img0, img1, args.t)
        imageio.imwrite(args.out, pred)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
