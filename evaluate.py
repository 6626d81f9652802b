"""Evaluation CLI (reference ``evaluate.py:213-246`` UX).

Usage:
  python evaluate.py --exp_name my_exp [--ckpt best_vimeo90k] [--ssim]
  python evaluate.py --config configs/DAT.yaml --ckpt <name>   # explicit cfg
"""

from __future__ import annotations

import argparse
from pathlib import Path


def main() -> None:
    parser = argparse.ArgumentParser(description="TPU-native VFI evaluation")
    parser.add_argument("--exp_name", type=str, default=None)
    parser.add_argument("--config", type=str, default=None)
    parser.add_argument("--ckpt", type=str, default=None,
                        help="checkpoint name (default: best_<benchmark>)")
    parser.add_argument("--benchmark", type=str, default="vimeo90k",
                        choices=["vimeo90k", "ucf101", "snu", "synthetic"])
    parser.add_argument("--ssim", action="store_true")
    parser.add_argument("--batch_size", type=int, default=4)
    parser.add_argument("--window_sampling", action="store_true",
                        help="evaluate through the exact-parity windowed "
                        "sampling fast path (same params — any flagship "
                        "checkpoint works)")
    parser.add_argument("--tile", type=int, default=0,
                        help="spatial tile size for HD frames (0 = off; "
                        "e.g. SNU-FILM extreme 1280x720) — overlap is "
                        "sized per pair from the model's own flow estimate")
    args = parser.parse_args()

    from videoframeinterpolation_tpu.utils.platform import honor_env_platform

    honor_env_platform()

    import jax

    from videoframeinterpolation_tpu.config import Config
    from videoframeinterpolation_tpu.eval import (
        validate_snu, validate_synthetic, validate_ucf101, validate_vimeo90k,
    )
    from videoframeinterpolation_tpu.models import create_model
    from videoframeinterpolation_tpu.train.checkpoint import CheckpointManager
    from videoframeinterpolation_tpu.train.state import create_train_state

    if args.config:
        cfg = Config.from_yaml(args.config,
                               exp_name=args.exp_name or "eval")
    else:
        assert args.exp_name, "--exp_name or --config required"
        cfg = Config.from_yaml(
            Path("exps") / args.exp_name / "config.yaml"
        )

    # float32 evaluation for PSNR parity regardless of training dtype.
    cfg.compute_dtype = "float32"
    if args.window_sampling:
        cfg.window_sampling = True
    model = create_model(cfg)

    import jax.numpy as jnp

    dummy = jnp.zeros((1, 32, 32, 3), jnp.float32)
    t = jnp.full((1, 1, 1, 1), 0.5, jnp.float32)
    params = model.init(jax.random.key(0), dummy, dummy, t)
    state = create_train_state(model, params, cfg)

    ckpt_name = args.ckpt or f"best_{cfg.save_best_benchmark}"
    ckpt = CheckpointManager(cfg.log_dir)
    state, meta = ckpt.restore(ckpt_name, state)
    n = sum(int(l.size) for l in jax.tree_util.tree_leaves(state.params))
    print(f"Number of params: {n}")

    def apply_fn(p, x0, x1, t):
        return model.apply(p, x0, x1, t)

    if args.tile:
        # HD frames (SNU-FILM hard/extreme) tile with a per-pair
        # flow-aware overlap; small frames route full-frame automatically.
        from videoframeinterpolation_tpu.parallel.spatial import (
            make_flow_aware_tiled,
        )
        infer = make_flow_aware_tiled(
            apply_fn, state.params, args.tile,
            train_apply_fn=lambda p, a, b, tt, train: model.apply(
                p, a, b, tt, train=train),
        )
    else:
        infer_jit = jax.jit(apply_fn)
        infer = lambda x0, x1, t: infer_jit(state.params, x0, x1, t)  # noqa: E731

    if args.benchmark == "vimeo90k":
        validate_vimeo90k(infer, cfg.root, batch_size=args.batch_size,
                          report_ssim=args.ssim)
    elif args.benchmark == "ucf101":
        validate_ucf101(infer, root=cfg.ucf101_root, report_ssim=args.ssim)
    elif args.benchmark == "synthetic":
        validate_synthetic(infer, seed=cfg.seed, report_ssim=args.ssim,
                           batch_size=args.batch_size)
    else:
        validate_snu(infer, root=cfg.snu_root, report_ssim=args.ssim)


if __name__ == "__main__":
    main()
