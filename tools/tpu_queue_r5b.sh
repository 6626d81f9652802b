#!/bin/bash
# Round-5 TPU queue, revision B (chains after tpu_queue_r5a.sh).
#
#  1. wide_latency   — price the wide-channel student candidates
#                      (VERDICT r4 #6: nf=72 convs cap at 33% of MXU peak,
#                      128-ch at 82% — the one untried TPU-first lever).
#  2. wide_distill   — nf=96/dec5 student distilled from the nf=72
#                      [8,16,8] teacher, same 24k protocol.
#  3. progressive    — distill a fresh [8,8,2] student from the w=1.0
#                      STUDENT (39.03) instead of the original teacher:
#                      does output-space distillation compound? (VERDICT #7)
#  4. ifrnet_sweep   — batch ladder b=1..16 + bytes/frame attribution for
#                      the b8 throughput regression (VERDICT #5).
#  5. eval_best re-scores of the new bests (grouped by architecture).
#
#   nohup bash tools/tpu_queue_r5b.sh > /tmp/tpu_queue/driver_r5b.log 2>&1 &
#   echo $! > /tmp/tpu_queue/driver_r5b.pid
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

if [ -f "$LOG/driver_r5a.pid" ]; then
  APID=$(cat "$LOG/driver_r5a.pid")
  while kill -0 "$APID" 2>/dev/null; do sleep 30; done
fi
say "r5a released the TPU"

if [ ! -f "$LOG/wide_latency.json" ]; then
  say "stage wide_latency: START"
  timeout 3600 python tools/perf/wide_student_bench.py \
    > "$LOG/wide_latency.log" 2>&1
  rc=$?
  grep -h '^{' "$LOG/wide_latency.log" > "$LOG/wide_latency.json" || true
  say "stage wide_latency: rc=$rc (tail: $(tail -1 "$LOG/wide_latency.log" 2>/dev/null | cut -c1-160))"
else say "stage wide_latency: skip"; fi

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

if [ ! -f "$LOG/ifrnet_sweep.json" ]; then
  say "stage ifrnet_sweep: START"
  timeout 5400 python tools/perf/ifrnet_batch_sweep.py \
    > "$LOG/ifrnet_sweep.log" 2>&1
  rc=$?
  grep -h '^{' "$LOG/ifrnet_sweep.log" > "$LOG/ifrnet_sweep.json" || true
  say "stage ifrnet_sweep: rc=$rc (tail: $(tail -1 "$LOG/ifrnet_sweep.log" 2>/dev/null | cut -c1-160))"
else say "stage ifrnet_sweep: skip"; fi

# Re-scores, grouped by architecture (one remote compile each).
G1=()
for f in \
  "$RES/DATwConstantnCv1_shared_s8-8-2_distill1.5T8-16-8_24k.best.ckpt" \
  "$RES/DATwConstantnCv1_shared_s8-8-2_distill2.0T8-16-8_24k.best.ckpt" \
  "$RES/DATwConstantnCv1_shared_s8-8-2_distill1.0T8-16-8_rt125-875_24k.best.ckpt" \
  "$RES/DATwConstantnCv1_shared_s8-8-2_distill1.0T8-8-2_24k.best.ckpt" \
  "$RES/DATwConstantnCv1_24k.best.ckpt"; do
  [ -f "$f" ] && G1+=("$f")
done
# NB: the exact-parity best (last entry) is an 8,16,32 arch — scored in
# its own group below, filtered back out of G1 here.
G1F=()
for f in "${G1[@]}"; do
  case "$f" in *DATwConstantnCv1_24k.best.ckpt) ;; *) G1F+=("$f");; esac
done
if [ "${#G1F[@]}" -gt 0 ]; then
  say "stage eval_r5_s882 (${#G1F[@]} ckpts): START"
  timeout 3600 python tools/quality/eval_best.py \
    --ckpt "${G1F[@]}" --shared --samples 8,8,2 \
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

say "queue r5b complete"
