"""Head-to-head quality study: parity flagship vs DAT-TPU on procedural data.

No Vimeo90K copy exists on this host, so architecture-level quality is
measured on the ``SyntheticMotion`` generator (exact GT flows, occlusions):
train a model from scratch with the flagship recipe and track held-out PSNR.
Run once per model (the tunneled TPU allows one process at a time):

  python tools/quality/head_to_head.py --model DATwConstantnCv1  --steps 4000
  python tools/quality/head_to_head.py --model DATwConstantnCTPU --steps 4000

Both invocations see byte-identical training batches (fixed scene pool,
fixed sampling seed), so the PSNR curves are directly comparable. Results
append to tools/quality/results/<model>.jsonl.

Reference bar this replaces: validation-as-test on Vimeo90K
(``/root/reference/train.py:104-130``).
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path
import sys

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import numpy as np
import jax

from videoframeinterpolation_tpu.utils.platform import honor_env_platform

honor_env_platform()

import jax.numpy as jnp


def build_pool(n_scenes: int, crop: tuple, seed: int, is_train: bool,
               **ds_kwargs):
    """Pre-generate a fixed scene pool (1-core host: generating ~64 ms/item
    inline would starve the TPU; a pool makes both models' data identical).
    ``ds_kwargs`` pass through to ``SyntheticMotion`` (e.g. ``random_t`` as
    a (lo, hi) range, or ``fixed_t`` for per-instant eval pools); the scene
    geometry is t-independent, so pools differing only in t share scenes."""
    from videoframeinterpolation_tpu.data.synthetic import SyntheticMotion

    ds = SyntheticMotion(crop_hw=crop, is_train=is_train, seed=seed,
                         num_items=n_scenes, **ds_kwargs)
    keys = ("x0", "x1", "xt", "t", "f0x", "f1x")
    items = [ds[i] for i in range(n_scenes)]
    return {k: np.stack([it[k] for it in items]) for k in keys}


def recover_best(jsonl_path: Path) -> tuple[float, int]:
    """Max held-out PSNR (and its step) over every eval event already in
    the curve — the watermark a resumed run must not regress below."""
    best_psnr, best_step = -1.0, -1
    if jsonl_path.exists():
        for line in jsonl_path.read_text().splitlines():
            try:
                rec = json.loads(line)
            except json.JSONDecodeError:
                continue
            if (rec.get("event") == "eval"
                    and rec.get("val_psnr", -1.0) > best_psnr):
                best_psnr = float(rec["val_psnr"])
                best_step = int(rec["step"])
    return best_psnr, best_step


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", required=True)
    ap.add_argument("--steps", type=int, default=4000)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--crop", type=int, default=128)
    ap.add_argument("--nf", type=int, default=72)
    ap.add_argument("--pool", type=int, default=768)
    ap.add_argument("--eval_every", type=int, default=500)
    ap.add_argument("--eval_items", type=int, default=32)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--warmup", type=int, default=500)
    ap.add_argument("--chunk", type=int, default=20,
                    help="optimizer steps per dispatch (lax.scan; identical "
                         "per-step math, amortizes the ~25 ms tunnel "
                         "dispatch + per-step scalar fetch)")
    ap.add_argument("--resume", action="store_true",
                    help="resume from results/<tag>.ckpt (exact: whole "
                         "TrainState restored, data sampler fast-forwarded "
                         "so the batch stream is byte-identical to an "
                         "uninterrupted run)")
    ap.add_argument("--distill_from", default=None,
                    help="path to an exact-parity flagship .ckpt (msgpack "
                         "TrainState from this tool); adds output-space "
                         "teacher distillation w*Charbonnier(pred_s - "
                         "pred_t) to the recipe — the VERDICT r3 #1b "
                         "recovery attempt for DAT_fast's ~0.3 dB gap. "
                         "Train-time-only cost; inference untouched")
    ap.add_argument("--distill_w", type=float, default=0.5)
    ap.add_argument("--teacher_nf", type=int, default=None,
                    help="teacher width (default: --nf; set when the "
                         "student width differs, e.g. the wide-channel "
                         "TPU student distilled from the nf=72 teacher)")
    ap.add_argument("--teacher_shared", action="store_true",
                    help="teacher uses shared offsets (default: exact-parity"
                    " teacher architecture)")
    ap.add_argument("--teacher_samples", default=None,
                    help="teacher per-level dat_samples, e.g. 8,16,8 "
                    "(default: reference 8,16,32)")
    ap.add_argument("--host_pool", action="store_true",
                    help="stream batches from host RAM (legacy); default "
                         "device_puts the whole pool into HBM once and "
                         "gathers batches on-device by index — per-chunk "
                         "transfer drops from ~136 MB to 160 ints on the "
                         "tunneled backend, bit-identical batches")
    ap.add_argument("--dilated", action="store_true",
                    help="DAT-TPU dilated window taps (wider reach)")
    ap.add_argument("--goff", action="store_true",
                    help="DAT-TPU per-group learned offsets")
    ap.add_argument("--shared", action="store_true",
                    help="flagship shared-offset variant (one offset set "
                         "per DAT level, 8x fewer sampler gather rows)")
    ap.add_argument("--samples", default=None,
                    help="flagship per-level sample counts 'lv3,lv2,lv1' "
                         "(default 8,16,32 = reference parity); e.g. "
                         "'8,16,16' halves the hot lv1 sampler's rows")
    ap.add_argument("--shared_levels", default=None,
                    help="comma list of DAT levels with shared offsets, "
                         "e.g. '2,1' shares lv2+lv1 and keeps per-group "
                         "offsets at lv3 (overrides --shared)")
    ap.add_argument("--attn_stride", type=int, default=1,
                    help="flagship lv1 query-grid stride (2 = quarter the "
                         "finest level's queries, learned upsample back)")
    ap.add_argument("--movement_nf", default=None,
                    help="flagship movement-extractor width per level "
                         "'lv3,lv2,lv1' (default: nf at every level)")
    ap.add_argument("--dec_res_blocks", type=int, default=10,
                    help="generator residual blocks (reference parity 10; "
                         "the 720p profile puts the generator at ~18% of "
                         "HD latency — tools/perf/README.md)")
    ap.add_argument("--random_t", default=None,
                    help="train-pool t range 'lo,hi' (e.g. 0.125,0.875 to "
                         "cover the factor-8 serving instants); held-out "
                         "eval stays t=0.5 for cross-arm comparability — "
                         "per-instant PSNR comes from eval_instants.py")
    ap.add_argument("--stop_at", type=int, default=None,
                    help="stop training at this step while keeping the "
                         "--steps LR schedule (regenerates an early-curve "
                         "best checkpoint byte-identically: same schedule, "
                         "same batch stream, truncated run)")
    ap.add_argument("--tag_suffix", default=None,
                    help="appended to the result tag (separate jsonl/ckpt "
                         "namespace, e.g. a best-regen run that must not "
                         "touch the committed curve)")
    ap.add_argument("--out_dir", type=str,
                    default=str(Path(__file__).parent / "results"))
    args = ap.parse_args()

    from videoframeinterpolation_tpu.config import Config
    from videoframeinterpolation_tpu.models import create_model
    from videoframeinterpolation_tpu.parallel import create_mesh, shard_chunk
    from videoframeinterpolation_tpu.train import (
        create_train_state, make_chunked_train_step,
        make_pool_chunked_train_step,
    )
    from videoframeinterpolation_tpu.eval.metrics import psnr

    out_dir = Path(args.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    if args.shared_levels:
        lv = {int(x) for x in args.shared_levels.split(",")}
        shared = tuple(l in lv for l in (3, 2, 1))
        shared_tag = "_shared" + "".join(str(l) for l in sorted(lv, reverse=True))
    else:
        shared = bool(args.shared)
        shared_tag = "_shared" if args.shared else ""
    samples = (tuple(int(x) for x in args.samples.split(","))
               if args.samples else (8, 16, 32))
    movement_nf = (tuple(int(x) for x in args.movement_nf.split(","))
                   if args.movement_nf else None)
    tag = (args.model + ("_dilated" if args.dilated else "")
           + ("_goff" if args.goff else "")
           + shared_tag
           + ("_s" + "-".join(map(str, samples)) if args.samples else "")
           + (f"_stride{args.attn_stride}" if args.attn_stride != 1 else "")
           + ("_mv" + "-".join(map(str, movement_nf)) if movement_nf else "")
           + (f"_dec{args.dec_res_blocks}" if args.dec_res_blocks != 10
              else "")
           + ((f"_distill{args.distill_w}"
               + (("T" + "-".join(args.teacher_samples.split(",")))
                  if args.teacher_samples else ""))
              if args.distill_from else "")
           + (f"_nf{args.nf}" if args.nf != 72 else "")
           + (("_rt" + "-".join(x.replace("0.", "")
                                for x in args.random_t.split(",")))
              if args.random_t else "")
           + (f"_seed{args.seed}" if args.seed != 42 else "")
           + (f"_{args.steps // 1000}k" if args.steps != 4000 else "")
           + (args.tag_suffix or ""))
    out_path = out_dir / f"{tag}.jsonl"

    OFFSET_SETS = ((-2, -1, 0, 1, 2), (-4, -2, -1, 0, 1, 2, 4),
                   (-6, -4, -2, -1, 0, 1, 2, 4, 6))
    cfg = Config(
        model_name=args.model, nf=args.nf,
        compute_dtype="bfloat16",
        start_lr=2e-4, end_lr=1e-5,
        last_lr_decay_iter=args.steps, warmup_steps=args.warmup,
        seed=args.seed,
        offset_sets=OFFSET_SETS if args.dilated else None,
        n_offset_groups=(4, 8, 8) if args.goff else (0, 0, 0),
        shared_offsets=shared,
        dat_samples=samples,
        dec_res_blocks=args.dec_res_blocks,
        dat_attn_stride=(1, 1, args.attn_stride),
        dat_movement_nf=movement_nf,
    )
    model = create_model(cfg)
    mesh = create_mesh()

    crop = (args.crop, args.crop)
    print("generating scene pools ...", flush=True)
    t0 = time.perf_counter()
    rt = (tuple(float(x) for x in args.random_t.split(","))
          if args.random_t else False)
    pool = build_pool(args.pool, crop, args.seed, is_train=True, random_t=rt)
    val = build_pool(args.eval_items, crop, args.seed, is_train=False)
    print(f"pools ready ({time.perf_counter() - t0:.0f}s)", flush=True)

    params = model.init(
        jax.random.key(cfg.seed),
        jnp.asarray(pool["x0"][:1]), jnp.asarray(pool["x1"][:1]),
        jnp.asarray(pool["t"][:1]), train=True,
    )
    n_params = sum(int(x.size) for x in jax.tree_util.tree_leaves(params))
    state = create_train_state(model, params, cfg)
    if args.eval_every % args.chunk or args.steps % args.chunk:
        raise SystemExit("--chunk must divide --eval_every and --steps")
    teacher_params = None
    if args.distill_from:
        # Teacher defaults to the exact-parity architecture (reference
        # samples, per-group offsets); --teacher_shared/--teacher_samples
        # match the teacher to whatever head_to_head checkpoint is given
        # (e.g. the completed s8-16-8 horizon arm). Restore params from a
        # head_to_head checkpoint.
        import flax.serialization as _fser

        t_samples = (tuple(int(x) for x in args.teacher_samples.split(","))
                     if args.teacher_samples else (8, 16, 32))
        t_cfg = Config(model_name=args.model,
                       nf=args.teacher_nf or args.nf,
                       compute_dtype="bfloat16",
                       shared_offsets=bool(args.teacher_shared),
                       dat_samples=t_samples,
                       start_lr=2e-4, end_lr=1e-5,
                       last_lr_decay_iter=args.steps,
                       warmup_steps=args.warmup, seed=args.seed)
        teacher = create_model(t_cfg)
        t_params = teacher.init(
            jax.random.key(0),
            jnp.asarray(pool["x0"][:1]), jnp.asarray(pool["x1"][:1]),
            jnp.asarray(pool["t"][:1]), train=True)
        t_state = create_train_state(teacher, t_params, t_cfg)
        t_state = _fser.from_bytes(t_state,
                                   Path(args.distill_from).read_bytes())
        teacher_params = jax.device_put(t_state.params)
        print(f"teacher restored from {args.distill_from} "
              f"(step {int(t_state.step)})", flush=True)

        from videoframeinterpolation_tpu.train import (
            make_distill_pool_chunked_step,
        )

        distill_chunked = make_distill_pool_chunked_step(
            model, teacher, cfg, mesh, args.chunk, args.distill_w)
        pool_dev = jax.device_put(pool)

        def step_fn(state, pool_d, idx):
            return distill_chunked(state, teacher_params, pool_d, idx)

    elif args.host_pool:
        step_fn = make_chunked_train_step(model, cfg, mesh, args.chunk)
        pool_dev = None
    else:
        step_fn = make_pool_chunked_train_step(model, cfg, mesh, args.chunk)
        pool_dev = jax.device_put(pool)  # once; ~650 MB at standard size

    # fp32 eval path (framework convention) over the held-out pool.
    eval_cfg = Config(model_name=args.model, nf=args.nf,
                      compute_dtype="float32",
                      offset_sets=OFFSET_SETS if args.dilated else None,
                      n_offset_groups=(4, 8, 8) if args.goff else (0, 0, 0),
                      shared_offsets=shared, dat_samples=samples,
                      dat_attn_stride=(1, 1, args.attn_stride),
                      dat_movement_nf=movement_nf,
                      dec_res_blocks=args.dec_res_blocks)
    eval_model = create_model(eval_cfg)
    infer = jax.jit(lambda p, a, b, t: eval_model.apply(p, a, b, t))
    vx0, vx1, vt = (jnp.asarray(val[k]) for k in ("x0", "x1", "t"))
    vxt = val["xt"]

    def held_out_psnr(params) -> float:
        ps = []
        eb = 8
        for i in range(0, vx0.shape[0], eb):
            pred = np.asarray(
                infer(params, vx0[i:i + eb], vx1[i:i + eb], vt[i:i + eb]))
            for j in range(pred.shape[0]):
                ps.append(float(psnr(pred[j], vxt[i + j])))
        return float(np.mean(ps))

    log_f = open(out_path, "a")

    def emit(rec):
        rec["model"] = tag
        log_f.write(json.dumps(rec) + "\n")
        log_f.flush()
        print(rec, flush=True)

    import flax.serialization as fser

    ckpt_path = out_dir / f"{tag}.ckpt"
    best_path = out_dir / f"{tag}.best.ckpt"
    sampler = np.random.Generator(np.random.PCG64(args.seed + 777))
    step0 = 0
    best_psnr, best_step = -1.0, -1
    if args.resume and ckpt_path.exists():
        state = fser.from_bytes(state, ckpt_path.read_bytes())
        step0 = int(state.step)
        # Fast-forward the sampler so batches step0+1.. are byte-identical
        # to an uninterrupted run's.
        for _ in range(step0):
            sampler.integers(0, args.pool, size=args.batch)
        # Recover the best-PSNR watermark from the existing curve so the
        # first post-resume eval cannot overwrite a better earlier best
        # checkpoint (round-4 bug: the exact-parity 24k arm's committed
        # "best" was step 20500 @ 37.98 while the curve's true best was
        # 38.18 @ 15500 — VERDICT r4 weak #1).
        best_psnr, best_step = recover_best(out_path)
        emit({"event": "resume", "step": step0,
              "best_psnr": best_psnr, "best_step": best_step})
    else:
        emit({"event": "start", "n_params": n_params, "steps": args.steps,
              "batch": args.batch, "crop": args.crop, "pool": args.pool,
              "chunk": args.chunk})

    def save_ckpt(state, path=ckpt_path):
        tmp = path.with_suffix(".ckpt.tmp")
        tmp.write_bytes(fser.to_bytes(jax.device_get(state)))
        tmp.rename(path)

    run_until = min(args.steps, args.stop_at) if args.stop_at else args.steps
    t_start = time.perf_counter()
    loss_acc, n_acc = 0.0, 0
    step = step0
    while step < run_until:
        idx = [sampler.integers(0, args.pool, size=args.batch)
               for _ in range(args.chunk)]
        if pool_dev is not None:
            state, logs = step_fn(
                state, pool_dev, jnp.asarray(np.stack(idx), jnp.int32))
        else:
            batches = {k: np.stack([v[i] for i in idx])
                       for k, v in pool.items()}
            state, logs = step_fn(state, shard_chunk(batches, mesh))
        if step == step0:
            print(f"first chunk done ({time.perf_counter() - t_start:.0f}s "
                  f"incl. compile)", flush=True)
        step += args.chunk
        loss_acc += float(jnp.sum(logs["total_loss"]))
        n_acc += args.chunk
        if step % args.eval_every == 0 or step >= run_until:
            p = held_out_psnr(state.params)
            emit({"event": "eval", "step": step,
                  "train_loss": round(loss_acc / n_acc, 5),
                  "val_psnr": round(p, 4),
                  "elapsed_s": round(time.perf_counter() - t_start, 1)})
            loss_acc, n_acc = 0.0, 0
            save_ckpt(state)
            if p > best_psnr:
                # Best-PSNR snapshot: the distillation teacher should be
                # the best model along the curve, not the last step
                # (round-3 exact arm peaked at 12k of 18k).
                best_psnr, best_step = p, step
                save_ckpt(state, best_path)

    final = held_out_psnr(state.params)
    emit({"event": "final" if step >= args.steps else "stop",
          "step": step, "val_psnr": round(final, 4),
          "best_psnr": best_psnr, "best_step": best_step,
          "elapsed_s": round(time.perf_counter() - t_start, 1)})
    log_f.close()


if __name__ == "__main__":
    main()
