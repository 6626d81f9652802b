#!/bin/bash
# Round-5 TPU queue, revision I (supersedes r5h before its first TPU
# stage fired). On top of r5h's changes, the TPU tunnel stalled at
# 05:11 with the r5f regen leg at step 2000 (client blocked in a futex
# on an RPC that never returned; the stall predates any driver kill).
# That makes the exact-best regen leg cost ~8.2 ks from its last saved
# ckpt — so it moves BEHIND the rt arm + per-instant eval and gates
# DYNAMICALLY on the time actually needed from wherever the curve
# stopped, instead of burning a fixed budget it cannot finish in.
#
# Two discoveries forced the rebudget:
#  - The r5f exact-best regen restarted from step 0 (its resume ckpt was
#    lost with the VM restart) — PSNR-identical to the committed curve at
#    every eval, so training is deterministic, but its 4500 s stage only
#    reaches ~step 6500 of the required 15500; the resume leg now costs
#    ~5.6 ks instead of ~2.9 ks.
#  - The shipped w=1.0 winner's .best.ckpt (39.0322 @ 14500,
#    eval_best.jsonl:8) is on neither disk nor git — the artifact policy
#    (tools/quality/README.md) says it is one of the two checkpoints that
#    MUST be committed. It is regenerable byte-identically with
#    --stop_at 14500 (~1.9 ks) and unblocks the per-instant eval.
#
# Stage list, by VERDICT-r4 priority, sized to the 11:00 deadline
# (~18.7 ks of TPU time from the r5f stage's exit at ~05:49):
#  1. s123_w1       second-seed distilled w=1.0 arm, FULL 24k    ~2.6 ks
#  2. s123_exact    second-seed exact arm, stop_at 6000 — the
#                   seed-42 margin at the 6k truncation is +0.52 dB,
#                   still above the round-2 ±0.4 dB cross-seed
#                   noise; 8k (+0.60) did not fit the budget      ~4.1 ks
#  3. w1best_regen  regenerate + promote the shipped winner's
#                   .best.ckpt (guarded on 39.0322 @ 14500)       ~1.9 ks
#  4. regen_finish  resume exact-best regen ~6.5k -> 15.5k +
#                   guarded restore (partial = useless, so it
#                   runs BEFORE the partial-tolerant rt arm)      ~5.6 ks
#  5. rt_arm        distilled w=1.0 + random_t 0.125-0.875;
#                   deadline-truncated partial still usable       ~2.7 ks
#  6. instants      per-instant PSNR: shipped best vs rt best     ~1.5 ks
#  7. ifrnet_sweep / wide_latency / progressive     (slack only)
#
#   nohup bash tools/tpu_queue_r5h.sh <prior_pid> > /tmp/tpu_queue/driver_r5h.log 2>&1 &
set -u
cd /root/repo
LOG=/tmp/tpu_queue
mkdir -p "$LOG"
RES=tools/quality/results
W1BEST="$RES/DATwConstantnCv1_shared_s8-8-2_distill1.0T8-16-8_24k.best.ckpt"
TEACHER="configs/teachers/DATwConstantnCv1_shared_s8-16-8.best.ckpt"
DEADLINE=$(date -d "2026-08-20 11:00" +%s)

stamp() { date "+%H:%M:%S"; }
say() { echo "[$(stamp)] $*"; }
left() { echo $(( DEADLINE - $(date +%s) )); }
has_final() { [ -f "$1" ] && grep -q '"event": "final"' "$1"; }
has_stop() { [ -f "$1" ] && grep -qE '"event": "(final|stop)"' "$1"; }
has_eval() { [ -f "$1" ] && grep -q '"event": "eval"' "$1"; }

say "queue r5i starting ($(left)s to deadline)"

# 0. Wait for the r5f regen stage (orphaned after its driver was killed)
#    to hit its own 4500 s timeout; one TPU process at a time. PID given
#    as $1 — no pattern matching.
PRIOR_PID="${1:-}"
if [ -n "$PRIOR_PID" ]; then
  while [ -d "/proc/$PRIOR_PID" ]; do sleep 30; done
fi
say "stage 0: prior regen process exited ($(left)s left)"

# 1. Second-seed distilled w=1.0 arm, FULL 24k. Clear any dead
#    start-only jsonl from the killed r5a so the curve is one run.
J="$RES/DATwConstantnCv1_shared_s8-8-2_distill1.0T8-16-8_seed123_24k.jsonl"
if ! has_eval "$J"; then rm -f "$J"; fi
if ! has_final "$J" && [ "$(left)" -ge 3000 ]; then
  B=$(( $(left) - 120 )); [ "$B" -gt 3600 ] && B=3600
  say "stage s123_w1: START (budget ${B}s)"
  timeout "$B" python tools/quality/head_to_head.py \
    --model DATwConstantnCv1 --shared --samples 8,8,2 --steps 24000 \
    --seed 123 --distill_from "$TEACHER" \
    --teacher_shared --teacher_samples 8,16,8 --distill_w 1.0 --resume \
    > "$LOG/s123_w1.log" 2>&1
  say "stage s123_w1: rc=$? (tail: $(tail -1 "$LOG/s123_w1.log" 2>/dev/null | cut -c1-160))"
else say "stage s123_w1: skip"; fi

# 2. Second-seed exact-parity arm, stop_at 6000 on the 24k schedule
#    (matched-truncation comparison; 6000 x 0.54 + startup ~ 4.1 ks).
J="$RES/DATwConstantnCv1_seed123_24k.jsonl"
if ! has_eval "$J"; then rm -f "$J"; fi
if ! has_stop "$J" && [ "$(left)" -ge 3800 ]; then
  B=$(( $(left) - 120 )); [ "$B" -gt 4600 ] && B=4600
  say "stage s123_exact_6k: START (budget ${B}s)"
  timeout "$B" python tools/quality/head_to_head.py \
    --model DATwConstantnCv1 --steps 24000 --stop_at 6000 \
    --seed 123 --resume \
    > "$LOG/exact_s123.log" 2>&1
  say "stage s123_exact_6k: rc=$? (tail: $(tail -1 "$LOG/exact_s123.log" 2>/dev/null | cut -c1-160))"
else say "stage s123_exact_6k: skip"; fi

# 3. Regenerate the shipped winner's best checkpoint (the artifact the
#    policy says must be committed; eval_best re-scored it 39.0322 @
#    14500 before the file was lost). Deterministic protocol: same seed,
#    same batch stream, truncated at the best step.
RJ="$RES/DATwConstantnCv1_shared_s8-8-2_distill1.0T8-16-8_24k_w1regen.jsonl"
if [ ! -f "$W1BEST" ] && ! has_stop "$RJ" && [ "$(left)" -ge 2100 ]; then
  B=$(( $(left) - 120 )); [ "$B" -gt 2700 ] && B=2700
  say "stage w1best_regen: START (budget ${B}s)"
  timeout "$B" python tools/quality/head_to_head.py \
    --model DATwConstantnCv1 --shared --samples 8,8,2 --steps 24000 \
    --stop_at 14500 --tag_suffix _w1regen --resume \
    --distill_from "$TEACHER" \
    --teacher_shared --teacher_samples 8,16,8 --distill_w 1.0 \
    > "$LOG/w1best_regen.log" 2>&1
  say "stage w1best_regen: rc=$? (tail: $(tail -1 "$LOG/w1best_regen.log" 2>/dev/null | cut -c1-160))"
  # Guarded promote: the regen must reproduce 39.0322 @ 14500.
  python - <<'EOF'
import json, shutil, pathlib
res = pathlib.Path("tools/quality/results")
rj = res / "DATwConstantnCv1_shared_s8-8-2_distill1.0T8-16-8_24k_w1regen.jsonl"
best, step = -1.0, -1
if rj.exists():
    for line in rj.read_text().splitlines():
        r = json.loads(line)
        if r.get("event") == "eval" and r["val_psnr"] > best:
            best, step = r["val_psnr"], r["step"]
src = rj.with_suffix(".best.ckpt")
dst = res / "DATwConstantnCv1_shared_s8-8-2_distill1.0T8-16-8_24k.best.ckpt"
if step == 14500 and abs(best - 39.0322) < 0.06 and src.exists():
    shutil.copyfile(src, dst)
    print(f"w1 best regenerated + promoted: {best} @ {step}")
else:
    print(f"w1 best NOT promoted (best {best} @ {step})")
EOF
else say "stage w1best_regen: skip"; fi

# 4. Multi-instant arm: distilled w=1.0 with the training-pool t drawn
#    uniformly from [0.125, 0.875] (covers the factor-8 serving grid);
#    held-out eval stays t=0.5 for cross-arm comparability. A
#    deadline-truncated partial is still usable at its best eval.
J="$RES/DATwConstantnCv1_shared_s8-8-2_distill1.0T8-16-8_rt125-875_24k.jsonl"
if ! has_eval "$J"; then rm -f "$J"; fi
if ! has_final "$J" && [ "$(left)" -ge 2400 ]; then
  B=$(( $(left) - 1500 )); [ "$B" -gt 3600 ] && B=3600
  [ "$B" -lt 1800 ] && B=1800
  say "stage rt_arm: START (budget ${B}s)"
  timeout "$B" python tools/quality/head_to_head.py \
    --model DATwConstantnCv1 --shared --samples 8,8,2 --steps 24000 \
    --random_t 0.125,0.875 --distill_from "$TEACHER" \
    --teacher_shared --teacher_samples 8,16,8 --distill_w 1.0 --resume \
    > "$LOG/rt_arm.log" 2>&1
  say "stage rt_arm: rc=$? (tail: $(tail -1 "$LOG/rt_arm.log" 2>/dev/null | cut -c1-160))"
else say "stage rt_arm: skip"; fi

# 5. Per-instant PSNR/SSIM: shipped (t=0.5 trained) w=1.0 best vs the
#    rt arm's best — quantifies the t-extrapolation penalty.
RTBEST="$RES/DATwConstantnCv1_shared_s8-8-2_distill1.0T8-16-8_rt125-875_24k.best.ckpt"
G2=()
[ -f "$W1BEST" ] && G2+=("$W1BEST")
[ -f "$RTBEST" ] && G2+=("$RTBEST")
if [ "${#G2[@]}" -gt 0 ] && [ "$(left)" -ge 1200 ] \
   && ! grep -q "rt125-875" "$RES/eval_instants.jsonl" 2>/dev/null; then
  B=$(( $(left) - 90 )); [ "$B" -gt 2400 ] && B=2400
  say "stage instants (${#G2[@]} ckpts): START (budget ${B}s)"
  timeout "$B" python tools/quality/eval_instants.py \
    --ckpt "${G2[@]}" --shared --samples 8,8,2 \
    > "$LOG/instants.log" 2>&1
  say "stage instants: rc=$? (tail: $(tail -1 "$LOG/instants.log" 2>/dev/null | cut -c1-200))"
else say "stage instants: skip"; fi

# 6. Finish the exact-best regen (resume from the last periodic ckpt;
#    watermark recovery keeps earlier bests). A PARTIAL regen is
#    useless (the guard needs step 15500), so the stage computes the
#    time it actually needs from the curve's last eval step (0.54
#    s/step + ~1 ks startup) and skips outright if that does not fit —
#    no fixed budget to burn without finishing.
RJ="$RES/DATwConstantnCv1_24k_regenbest.jsonl"
LASTSTEP=$(grep '"event": "eval"' "$RJ" 2>/dev/null | tail -1 \
           | sed 's/.*"step": \([0-9]*\).*/\1/')
LASTSTEP=${LASTSTEP:-0}
NEED=$(( (15500 - LASTSTEP) * 54 / 100 + 1100 ))
if ! has_stop "$RJ" && [ "$(left)" -ge $(( NEED + 150 )) ]; then
  B=$(( NEED + 400 )); MAXB=$(( $(left) - 120 )); [ "$B" -gt "$MAXB" ] && B=$MAXB
  say "stage regen_finish: START (budget ${B}s)"
  timeout "$B" python tools/quality/head_to_head.py \
    --model DATwConstantnCv1 --steps 24000 --stop_at 15500 \
    --tag_suffix _regenbest --resume \
    > "$LOG/exact_regen4.log" 2>&1
  say "stage regen_finish: rc=$? (tail: $(tail -1 "$LOG/exact_regen4.log" 2>/dev/null | cut -c1-160))"
else say "stage regen_finish: skip (done or no time)"; fi
# Guarded restore: only replace the committed best if the regen curve
# reproduces the quoted 38.18 @ 15500 within noise.
python - <<'EOF'
import json, shutil, pathlib
res = pathlib.Path("tools/quality/results")
rj = res / "DATwConstantnCv1_24k_regenbest.jsonl"
best, step = -1.0, -1
if rj.exists():
    for line in rj.read_text().splitlines():
        r = json.loads(line)
        if r.get("event") == "eval" and r["val_psnr"] > best:
            best, step = r["val_psnr"], r["step"]
src = res / "DATwConstantnCv1_24k_regenbest.best.ckpt"
if step == 15500 and abs(best - 38.1769) < 0.06 and src.exists():
    shutil.copyfile(src, res / "DATwConstantnCv1_24k.best.ckpt")
    print(f"regen best restored: {best} @ {step}")
else:
    print(f"regen NOT restored (best {best} @ {step})")
EOF

# 7. Slack-only probes (fire only if earlier stages skipped/ran short) (fire only if earlier stages skipped/ran short).
if [ ! -f "$LOG/ifrnet_sweep.json" ] && [ "$(left)" -ge 1500 ]; then
  B=$(( $(left) - 90 )); [ "$B" -gt 3600 ] && B=3600
  say "stage ifrnet_sweep: START (budget ${B}s)"
  timeout "$B" python tools/perf/ifrnet_batch_sweep.py \
    > "$LOG/ifrnet_sweep.log" 2>&1
  rc=$?
  grep -h '^{' "$LOG/ifrnet_sweep.log" > "$LOG/ifrnet_sweep.json" || true
  say "stage ifrnet_sweep: rc=$rc (tail: $(tail -1 "$LOG/ifrnet_sweep.log" 2>/dev/null | cut -c1-160))"
else say "stage ifrnet_sweep: skip"; fi
if [ ! -f "$LOG/wide_latency.json" ] && [ "$(left)" -ge 1500 ]; then
  B=$(( $(left) - 90 )); [ "$B" -gt 2700 ] && B=2700
  say "stage wide_latency: START (budget ${B}s)"
  timeout "$B" python tools/perf/wide_student_bench.py \
    > "$LOG/wide_latency.log" 2>&1
  rc=$?
  grep -h '^{' "$LOG/wide_latency.log" > "$LOG/wide_latency.json" || true
  say "stage wide_latency: rc=$rc (tail: $(tail -1 "$LOG/wide_latency.log" 2>/dev/null | cut -c1-160))"
else say "stage wide_latency: skip"; fi
J="$RES/DATwConstantnCv1_shared_s8-8-2_distill1.0T8-8-2_24k.jsonl"
if [ -f "$W1BEST" ] && ! has_final "$J" && [ "$(left)" -ge 3000 ]; then
  B=$(( $(left) - 90 )); [ "$B" -gt 3600 ] && B=3600
  say "stage progressive_24k: START (budget ${B}s)"
  timeout "$B" python tools/quality/head_to_head.py \
    --model DATwConstantnCv1 --shared --samples 8,8,2 --steps 24000 \
    --distill_from "$W1BEST" --teacher_shared --teacher_samples 8,8,2 \
    --distill_w 1.0 --resume \
    > "$LOG/progressive_24k.log" 2>&1
  say "stage progressive_24k: rc=$? (tail: $(tail -1 "$LOG/progressive_24k.log" 2>/dev/null | cut -c1-160))"
else say "stage progressive_24k: skip"; fi

say "queue r5i complete ($(left)s to deadline)"
