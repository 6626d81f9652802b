#!/bin/bash
# Round-5 TPU queue, revision C (chains after tpu_queue_r5a.sh; REPLACES
# the killed r5b — the exact-parity arms run ~0.4-0.6 s/step vs 0.07 for
# the fast arms, so the original r5a+r5b plan overran the round; the
# seed-123 exact arm was marker-skipped in r5a and runs here with
# --stop_at 18000 instead: the 24k LR schedule is unchanged and both
# seed-42 peaks landed at 12k-15.5k, so an 18k truncation captures the
# best-vs-best comparison at ~75% of the cost).
#
# Stages, by VERDICT value per TPU-minute:
#  1. regen_finish    — resume the exact-best regen if r5a's timeout cut it
#  2. seed123_exact   — the second-seed exact arm (stop_at 18k)
#  3. wide_latency    — price the wide-student candidates (VERDICT #6)
#  4. ifrnet_sweep    — b=1..16 ladder + attribution (VERDICT #5)
#  5. progressive     — distill from the w=1.0 student (VERDICT #7)
#  6. wide_distill    — nf=96/dec5 student, 24k (VERDICT #6; last: biggest)
#  7. eval_best       — PSNR+SSIM re-scores of every new best
#
#   nohup bash tools/tpu_queue_r5c.sh > /tmp/tpu_queue/driver_r5c.log 2>&1 &
#   echo $! > /tmp/tpu_queue/driver_r5c.pid
set -u
cd /root/repo
LOG=/tmp/tpu_queue
mkdir -p "$LOG"
RES=tools/quality/results
TEACHER="configs/teachers/DATwConstantnCv1_shared_s8-16-8.best.ckpt"
W1BEST="$RES/DATwConstantnCv1_shared_s8-8-2_distill1.0T8-16-8_24k.best.ckpt"

stamp() { date "+%H:%M:%S"; }
say() { echo "[$(stamp)] $*"; }
has_final() { [ -f "$1" ] && grep -q '"event": "final"' "$1"; }
has_stop() { [ -f "$1" ] && grep -qE '"event": "(final|stop)"' "$1"; }

if [ -f "$LOG/driver_r5a.pid" ]; then
  APID=$(cat "$LOG/driver_r5a.pid")
  while kill -0 "$APID" 2>/dev/null; do sleep 30; done
fi
say "r5a released the TPU"

# 1. Finish the exact-best regen if r5a's timeout cut it short.
RJ="$RES/DATwConstantnCv1_24k_regenbest.jsonl"
if ! has_stop "$RJ"; then
  say "stage regen_finish: START"
  timeout 10800 python tools/quality/head_to_head.py \
    --model DATwConstantnCv1 --steps 24000 --stop_at 15500 \
    --tag_suffix _regenbest --resume \
    > "$LOG/exact_regen2.log" 2>&1
  say "stage regen_finish: rc=$? (tail: $(tail -1 "$LOG/exact_regen2.log" 2>/dev/null | cut -c1-160))"
else say "stage regen_finish: skip"; fi
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

# 2. Second-seed exact-parity arm, truncated at 18k on the 24k schedule.
J="$RES/DATwConstantnCv1_seed123_24k.jsonl"
if grep -q "placeholder" "$J" 2>/dev/null; then rm -f "$J"; fi
if ! has_stop "$J"; then
  say "stage seed123_exact_18k: START"
  timeout 10800 python tools/quality/head_to_head.py \
    --model DATwConstantnCv1 --steps 24000 --stop_at 18000 \
    --seed 123 --resume \
    > "$LOG/exact_s123.log" 2>&1
  say "stage seed123_exact_18k: rc=$? (tail: $(tail -1 "$LOG/exact_s123.log" 2>/dev/null | cut -c1-160))"
else say "stage seed123_exact_18k: skip"; fi

# 3. Wide-student latency ladder.
if [ ! -f "$LOG/wide_latency.json" ]; then
  say "stage wide_latency: START"
  timeout 3600 python tools/perf/wide_student_bench.py \
    > "$LOG/wide_latency.log" 2>&1
  rc=$?
  grep -h '^{' "$LOG/wide_latency.log" > "$LOG/wide_latency.json" || true
  say "stage wide_latency: rc=$rc (tail: $(tail -1 "$LOG/wide_latency.log" 2>/dev/null | cut -c1-160))"
else say "stage wide_latency: skip"; fi

# 4. IFRNet batch ladder + attribution.
if [ ! -f "$LOG/ifrnet_sweep.json" ]; then
  say "stage ifrnet_sweep: START"
  timeout 5400 python tools/perf/ifrnet_batch_sweep.py \
    > "$LOG/ifrnet_sweep.log" 2>&1
  rc=$?
  grep -h '^{' "$LOG/ifrnet_sweep.log" > "$LOG/ifrnet_sweep.json" || true
  say "stage ifrnet_sweep: rc=$rc (tail: $(tail -1 "$LOG/ifrnet_sweep.log" 2>/dev/null | cut -c1-160))"
else say "stage ifrnet_sweep: skip"; fi

# 5. Progressive distillation: teacher = the w=1.0 student.
J="$RES/DATwConstantnCv1_shared_s8-8-2_distill1.0T8-8-2_24k.jsonl"
if [ -f "$W1BEST" ] && ! has_final "$J"; then
  say "stage progressive_24k: START"
  timeout 9000 python tools/quality/head_to_head.py \
    --model DATwConstantnCv1 --shared --samples 8,8,2 --steps 24000 \
    --distill_from "$W1BEST" --teacher_shared --teacher_samples 8,8,2 \
    --distill_w 1.0 --resume \
    > "$LOG/progressive_24k.log" 2>&1
  say "stage progressive_24k: rc=$? (tail: $(tail -1 "$LOG/progressive_24k.log" 2>/dev/null | cut -c1-160))"
else say "stage progressive_24k: skip"; fi

# 6. Wide-channel student arm (biggest; bounded, resume-capable).
J="$RES/DATwConstantnCv1_shared_s8-8-2_dec5_distill1.0T8-16-8_nf96_24k.jsonl"
if ! has_final "$J"; then
  say "stage wide_distill_24k: START"
  timeout 10800 python tools/quality/head_to_head.py \
    --model DATwConstantnCv1 --shared --samples 8,8,2 --steps 24000 \
    --nf 96 --dec_res_blocks 5 \
    --distill_from "$TEACHER" --teacher_nf 72 --teacher_shared \
    --teacher_samples 8,16,8 --distill_w 1.0 --resume \
    > "$LOG/wide_distill_24k.log" 2>&1
  say "stage wide_distill_24k: rc=$? (tail: $(tail -1 "$LOG/wide_distill_24k.log" 2>/dev/null | cut -c1-160))"
else say "stage wide_distill_24k: skip (final)"; fi

# 7. Re-scores, grouped by architecture (one remote compile each).
G1=()
for f in \
  "$RES/DATwConstantnCv1_shared_s8-8-2_distill1.5T8-16-8_24k.best.ckpt" \
  "$RES/DATwConstantnCv1_shared_s8-8-2_distill2.0T8-16-8_24k.best.ckpt" \
  "$RES/DATwConstantnCv1_shared_s8-8-2_distill1.0T8-16-8_rt125-875_24k.best.ckpt" \
  "$RES/DATwConstantnCv1_shared_s8-8-2_distill1.0T8-8-2_24k.best.ckpt"; do
  [ -f "$f" ] && G1+=("$f")
done
if [ "${#G1[@]}" -gt 0 ]; then
  say "stage eval_r5_s882 (${#G1[@]} ckpts): START"
  timeout 3600 python tools/quality/eval_best.py \
    --ckpt "${G1[@]}" --shared --samples 8,8,2 \
    > "$LOG/eval_r5_s882.log" 2>&1
  say "stage eval_r5_s882: rc=$? (tail: $(tail -1 "$LOG/eval_r5_s882.log" 2>/dev/null | cut -c1-200))"
fi
if [ -f "$RES/DATwConstantnCv1_24k.best.ckpt" ]; then
  say "stage eval_r5_exact_regen: START"
  timeout 2400 python tools/quality/eval_best.py \
    --ckpt "$RES/DATwConstantnCv1_24k.best.ckpt" \
    > "$LOG/eval_r5_exact.log" 2>&1
  say "stage eval_r5_exact_regen: rc=$? (tail: $(tail -1 "$LOG/eval_r5_exact.log" 2>/dev/null | cut -c1-200))"
fi
W="$RES/DATwConstantnCv1_shared_s8-8-2_dec5_distill1.0T8-16-8_nf96_24k.best.ckpt"
if [ -f "$W" ]; then
  say "stage eval_r5_wide: START"
  timeout 2400 python tools/quality/eval_best.py \
    --ckpt "$W" --shared --samples 8,8,2 --nf 96 --dec_res_blocks 5 \
    > "$LOG/eval_r5_wide.log" 2>&1
  say "stage eval_r5_wide: rc=$? (tail: $(tail -1 "$LOG/eval_r5_wide.log" 2>/dev/null | cut -c1-200))"
fi

say "queue r5c complete"
