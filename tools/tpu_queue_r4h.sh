#!/bin/bash
# Round-4 TPU queue, revision H (ONE TPU process at a time — CLAUDE.md).
#
# Chains after tpu_queue_r4g.sh. Grounds the shipped distillation recipe
# (configs/DAT_fast_distill.yaml, w=0.5, [8,16,8] teacher) against its
# neighbors, all on the SAME 24k schedule + round-4 protocol as the
# in-protocol headline cohort (BENCH_NOTES top table):
#
#  1. distill_w1.0_24k  — does a stronger distillation term help?
#  2. distill_w0.25_24k — or a weaker one?
#  3. distill_s884_24k  — does distillation move the sample-ladder knee?
#     ([8,8,4] student, same teacher/w as shipped)
#  4. eval_best PSNR+SSIM re-scores of whatever bests the arms produced.
#
#   nohup bash tools/tpu_queue_r4h.sh > /tmp/tpu_queue/driver_h.log 2>&1 &
#   echo $! > /tmp/tpu_queue/driver_h.pid
set -u
cd /root/repo
LOG=/tmp/tpu_queue
mkdir -p "$LOG"
RES=tools/quality/results
TEACHER="$RES/DATwConstantnCv1_shared_s8-16-8_20k.best.ckpt"

stamp() { date "+%H:%M:%S"; }
say() { echo "[$(stamp)] $*"; }
has_final() { [ -f "$1" ] && grep -q '"event": "final"' "$1"; }

if [ -f "$LOG/driver_g.pid" ]; then
  GPID=$(cat "$LOG/driver_g.pid")
  while kill -0 "$GPID" 2>/dev/null; do sleep 30; done
fi
say "r4g released the TPU"

W1="$RES/DATwConstantnCv1_shared_s8-8-2_distill1.0T8-16-8_24k.jsonl"
if ! has_final "$W1"; then
  say "stage distill_w1.0_24k: START"
  timeout 9000 python tools/quality/head_to_head.py \
    --model DATwConstantnCv1 --shared --samples 8,8,2 --steps 24000 \
    --distill_from "$TEACHER" --teacher_shared --teacher_samples 8,16,8 \
    --distill_w 1.0 --resume \
    > "$LOG/distill_w10_24k.log" 2>&1
  say "stage distill_w1.0_24k: rc=$? (tail: $(tail -1 "$LOG/distill_w10_24k.log" 2>/dev/null | cut -c1-160))"
else say "stage distill_w1.0_24k: skip (final)"; fi

W25="$RES/DATwConstantnCv1_shared_s8-8-2_distill0.25T8-16-8_24k.jsonl"
if ! has_final "$W25"; then
  say "stage distill_w0.25_24k: START"
  timeout 9000 python tools/quality/head_to_head.py \
    --model DATwConstantnCv1 --shared --samples 8,8,2 --steps 24000 \
    --distill_from "$TEACHER" --teacher_shared --teacher_samples 8,16,8 \
    --distill_w 0.25 --resume \
    > "$LOG/distill_w025_24k.log" 2>&1
  say "stage distill_w0.25_24k: rc=$? (tail: $(tail -1 "$LOG/distill_w025_24k.log" 2>/dev/null | cut -c1-160))"
else say "stage distill_w0.25_24k: skip (final)"; fi

S884="$RES/DATwConstantnCv1_shared_s8-8-4_distill0.5T8-16-8_24k.jsonl"
if ! has_final "$S884"; then
  say "stage distill_s884_24k: START"
  timeout 9000 python tools/quality/head_to_head.py \
    --model DATwConstantnCv1 --shared --samples 8,8,4 --steps 24000 \
    --distill_from "$TEACHER" --teacher_shared --teacher_samples 8,16,8 \
    --resume \
    > "$LOG/distill_s884_24k.log" 2>&1
  say "stage distill_s884_24k: rc=$? (tail: $(tail -1 "$LOG/distill_s884_24k.log" 2>/dev/null | cut -c1-160))"
else say "stage distill_s884_24k: skip (final)"; fi

# PSNR+SSIM re-scores (grouped by architecture: one remote compile each)
G1=()
for f in \
  "$RES/DATwConstantnCv1_shared_s8-8-2_distill1.0T8-16-8_24k.best.ckpt" \
  "$RES/DATwConstantnCv1_shared_s8-8-2_distill0.25T8-16-8_24k.best.ckpt" \
  "$RES/DATwConstantnCv1_shared_s8-8-2_distill0.5_20k.best.ckpt"; do
  [ -f "$f" ] && G1+=("$f")
done
if [ "${#G1[@]}" -gt 0 ]; then
  say "stage eval_h_s8-8-2 (${#G1[@]} ckpts): START"
  timeout 2400 python tools/quality/eval_best.py \
    --ckpt "${G1[@]}" --shared --samples 8,8,2 \
    > "$LOG/eval_h_s882.log" 2>&1
  say "stage eval_h_s8-8-2: rc=$? (tail: $(tail -1 "$LOG/eval_h_s882.log" 2>/dev/null | cut -c1-200))"
fi
if [ -f "$RES/DATwConstantnCv1_shared_s8-8-4_distill0.5T8-16-8_24k.best.ckpt" ]; then
  say "stage eval_h_s8-8-4: START"
  timeout 2400 python tools/quality/eval_best.py \
    --ckpt "$RES/DATwConstantnCv1_shared_s8-8-4_distill0.5T8-16-8_24k.best.ckpt" \
    --shared --samples 8,8,4 \
    > "$LOG/eval_h_s884.log" 2>&1
  say "stage eval_h_s8-8-4: rc=$? (tail: $(tail -1 "$LOG/eval_h_s884.log" 2>/dev/null | cut -c1-200))"
fi

say "queue r4h complete"
