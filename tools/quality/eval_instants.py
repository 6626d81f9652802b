"""Per-instant PSNR/SSIM of head_to_head checkpoints at t = 1/8 .. 7/8.

Round 4 priced factor-8 direct serving (7 instants in one program,
``interpolate.py --mode direct``) at 7.85 ms/output-frame but never put a
quality number on any instant other than t=0.5 — every training recipe
fixed t=0.5 (reference ``data/Vimeo90K.py:37``; the reference never
validated its t-conditioned query builder at other instants either,
``modules/query_builder.py:28-36``). This tool scores a checkpoint on
held-out pools rendered at each served instant: the synthetic generator
renders exact GT at any t, and ``fixed_t`` pools share byte-identical
scene geometry, so the per-instant deltas isolate the t-extrapolation
penalty from scene noise.

  python tools/quality/eval_instants.py \
      --ckpt results/..._distill1.0T8-16-8_24k.best.ckpt --shared --samples 8,8,2

Appends one JSON line per (ckpt, t) to results/eval_instants.jsonl.
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path
import sys

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import numpy as np
import jax

from videoframeinterpolation_tpu.utils.platform import honor_env_platform

honor_env_platform()

import jax.numpy as jnp

from head_to_head import build_pool  # noqa: E402  (same dir)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True, nargs="+",
                    help="one or more same-architecture checkpoints")
    ap.add_argument("--model", default="DATwConstantnCv1")
    ap.add_argument("--nf", type=int, default=72)
    ap.add_argument("--shared", action="store_true")
    ap.add_argument("--samples", default=None)
    ap.add_argument("--dec_res_blocks", type=int, default=10)
    ap.add_argument("--eval_items", type=int, default=32)
    ap.add_argument("--crop", type=int, default=128)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--instants", default="1/8,2/8,3/8,4/8,5/8,6/8,7/8",
                    help="comma list of fractions (the factor-8 serving "
                         "grid by default)")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import flax.serialization as fser

    from videoframeinterpolation_tpu.config import Config
    from videoframeinterpolation_tpu.eval.metrics import psnr, ssim_3d
    from videoframeinterpolation_tpu.models import create_model
    from videoframeinterpolation_tpu.train.state import create_train_state

    samples = (tuple(int(x) for x in args.samples.split(","))
               if args.samples else (8, 16, 32))
    cfg = Config(model_name=args.model, nf=args.nf,
                 compute_dtype="bfloat16", shared_offsets=args.shared,
                 dat_samples=samples, dec_res_blocks=args.dec_res_blocks,
                 start_lr=2e-4, end_lr=1e-5, last_lr_decay_iter=1000,
                 warmup_steps=1, seed=args.seed)
    model = create_model(cfg)

    ts = []
    for frac in args.instants.split(","):
        num, den = frac.split("/") if "/" in frac else (frac, "1")
        ts.append(float(num) / float(den))

    # One pool per instant; scenes are byte-identical across instants
    # (fixed_t skips the rng t-draw), so only xt/GT-flows differ.
    crop = (args.crop, args.crop)
    pools = {t: build_pool(args.eval_items, crop, args.seed,
                           is_train=False, fixed_t=t) for t in ts}

    params0 = model.init(
        jax.random.key(cfg.seed),
        jnp.asarray(pools[ts[0]]["x0"][:1]),
        jnp.asarray(pools[ts[0]]["x1"][:1]),
        jnp.asarray(pools[ts[0]]["t"][:1]), train=True)
    template = create_train_state(model, params0, cfg)

    eval_cfg = Config(model_name=args.model, nf=args.nf,
                      compute_dtype="float32", shared_offsets=args.shared,
                      dat_samples=samples, dec_res_blocks=args.dec_res_blocks)
    eval_model = create_model(eval_cfg)
    infer = jax.jit(lambda p, a, b, t: eval_model.apply(p, a, b, t))

    out = Path(args.out) if args.out else (
        Path(__file__).parent / "results" / "eval_instants.jsonl")

    for ckpt in args.ckpt:
        state = fser.from_bytes(template, Path(ckpt).read_bytes())
        for t in ts:
            val = pools[t]
            vx0, vx1, vt = (jnp.asarray(val[k]) for k in ("x0", "x1", "t"))
            ps, ss = [], []
            eb = 8
            for i in range(0, vx0.shape[0], eb):
                pred = infer(state.params, vx0[i:i + eb], vx1[i:i + eb],
                             vt[i:i + eb])
                gt = jnp.asarray(val["xt"][i:i + eb])
                for j in range(pred.shape[0]):
                    ps.append(float(psnr(pred[j], gt[j])))
                    ss.append(float(ssim_3d(pred[j:j + 1], gt[j:j + 1],
                                            val_range=1.0)))
            rec = {"ckpt": str(ckpt), "step": int(state.step),
                   "t": round(t, 4),
                   "psnr": round(float(np.mean(ps)), 4),
                   "ssim": round(float(np.mean(ss)), 5),
                   "n": len(ps), "crop": args.crop, "seed": args.seed}
            print(json.dumps(rec), flush=True)
            with out.open("a") as f:
                f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
