"""Training CLI (reference ``train.py:135-151`` UX, TPU-native backend).

Usage:
  python train.py --exp_name my_exp --config configs/DAT.yaml [--resume latest]

No ``torch.distributed.launch``: a single process drives every local TPU
device through the mesh; multi-host runs call ``jax.distributed.initialize``
when ``--multihost`` is passed.
"""

from __future__ import annotations

import argparse


def main() -> None:
    parser = argparse.ArgumentParser(description="TPU-native VFI training")
    parser.add_argument("--exp_name", default="debug", type=str)
    parser.add_argument("--config", type=str, default="configs/DAT.yaml")
    parser.add_argument("--resume", type=str, default=None,
                        help="checkpoint name under <log_dir>/checkpoints "
                             "(e.g. 'latest')")
    parser.add_argument("--multihost", action="store_true",
                        help="initialize jax.distributed for multi-host pods")
    parser.add_argument("--set", dest="overrides", action="append",
                        default=[], metavar="KEY=VALUE",
                        help="config-field override, YAML-parsed; repeatable"
                             " (e.g. --set teacher_ckpt=exps/teacher/"
                             "checkpoints/best_vimeo90k --set "
                             "'dat_samples=[8, 16, 8]')")
    args = parser.parse_args()

    from videoframeinterpolation_tpu.utils.platform import honor_env_platform

    honor_env_platform()

    if args.multihost:
        import jax

        jax.distributed.initialize()

    from videoframeinterpolation_tpu.config import Config
    from videoframeinterpolation_tpu.train.trainer import Trainer

    import yaml

    overrides = {}
    for kv in args.overrides:
        key, sep, value = kv.partition("=")
        if not sep:
            raise SystemExit(f"--set expects KEY=VALUE, got {kv!r}")
        overrides[key] = yaml.safe_load(value)
    cfg = Config.from_yaml(args.config, exp_name=args.exp_name, **overrides)
    trainer = Trainer(cfg)
    if args.resume:
        trainer.resume(args.resume)
    trainer.train()


if __name__ == "__main__":
    main()
