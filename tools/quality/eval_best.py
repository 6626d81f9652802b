"""Evaluate a head_to_head best checkpoint: held-out PSNR + SSIM.

The quality study (`head_to_head.py`) tracks PSNR only; the reference
reports PSNR *and* SSIM for every benchmark (`/root/reference/
evaluate.py:213-246`), and a PSNR-only ranking can hide a structural
SSIM regression. This tool re-scores any committed `*.best.ckpt` on the
SAME held-out pool the study used (seed 42, 32 scenes, 128x128, fp32
eval path) and adds SSIM (`eval/metrics.py:ssim_3d`, the reference's
3-D-window formulation) so arms stay comparable across both metrics.

  python tools/quality/eval_best.py \
      --ckpt tools/quality/results/DATwConstantnCv1_24k.best.ckpt
  python tools/quality/eval_best.py \
      --ckpt ...s8-8-2_distill0.5T8-16-8_20k.best.ckpt --shared --samples 8,8,2

Appends one JSON line per run to results/eval_best.jsonl.
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
                    help="one or more same-architecture checkpoints "
                         "(scored in one process to share the 3-5 min "
                         "remote compile)")
    ap.add_argument("--model", default="DATwConstantnCv1")
    ap.add_argument("--nf", type=int, default=72)
    ap.add_argument("--shared", action="store_true")
    ap.add_argument("--samples", default=None,
                    help="comma triple, e.g. 8,8,2 (default: exact 8,16,32)")
    ap.add_argument("--dec_res_blocks", type=int, default=10)
    ap.add_argument("--eval_items", type=int, default=32)
    ap.add_argument("--crop", type=int, default=128)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--out", default=None,
                    help="JSONL to append to (default results/eval_best.jsonl)")
    args = ap.parse_args()

    import flax.serialization as fser

    from videoframeinterpolation_tpu.config import Config
    from videoframeinterpolation_tpu.eval.metrics import psnr, ssim_3d
    from videoframeinterpolation_tpu.models import create_model
    from videoframeinterpolation_tpu.train.state import create_train_state

    samples = (tuple(int(x) for x in args.samples.split(","))
               if args.samples else (8, 16, 32))
    # Restore the whole TrainState the way head_to_head's teacher path
    # does: build an identical template, then from_bytes.
    cfg = Config(model_name=args.model, nf=args.nf,
                 compute_dtype="bfloat16", shared_offsets=args.shared,
                 dat_samples=samples, dec_res_blocks=args.dec_res_blocks,
                 start_lr=2e-4, end_lr=1e-5, last_lr_decay_iter=1000,
                 warmup_steps=1, seed=args.seed)
    model = create_model(cfg)
    val = build_pool(args.eval_items, (args.crop, args.crop), args.seed,
                     is_train=False)
    params = model.init(jax.random.key(cfg.seed),
                        jnp.asarray(val["x0"][:1]), jnp.asarray(val["x1"][:1]),
                        jnp.asarray(val["t"][:1]), train=True)
    template = create_train_state(model, params, cfg)

    # fp32 eval path (framework convention: params fp32, eval compute fp32).
    eval_cfg = Config(model_name=args.model, nf=args.nf,
                      compute_dtype="float32", shared_offsets=args.shared,
                      dat_samples=samples, dec_res_blocks=args.dec_res_blocks)
    eval_model = create_model(eval_cfg)
    infer = jax.jit(lambda p, a, b, t: eval_model.apply(p, a, b, t))

    out = Path(args.out) if args.out else (
        Path(__file__).parent / "results" / "eval_best.jsonl")
    vx0, vx1, vt = (jnp.asarray(val[k]) for k in ("x0", "x1", "t"))

    for ckpt in args.ckpt:
        state = fser.from_bytes(template, Path(ckpt).read_bytes())
        # Identical protocol to head_to_head.held_out_psnr (no clipping,
        # same per-item mean) so PSNRs here reproduce the study curves
        # exactly; SSIM follows the same convention.
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
        rec = {
            "ckpt": str(ckpt), "step": int(state.step),
            "psnr": round(float(np.mean(ps)), 4),
            "ssim": round(float(np.mean(ss)), 5),
            "n": len(ps), "crop": args.crop, "seed": args.seed,
        }
        print(json.dumps(rec), flush=True)
        with out.open("a") as f:
            f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
