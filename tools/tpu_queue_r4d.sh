#!/bin/bash
# Round-4 TPU queue, revision D (ONE TPU process at a time — CLAUDE.md).
#
# Chains after tpu_queue_r4c.sh (waits on its driver pid), then runs the
# remaining round-4 quality arms, all resume-capable:
#
#  1. exact_24k_finish — keep resuming the exact-parity arm under the
#     ROUND-4 protocol until it reaches its "final" event at 24k steps,
#     so the headline "distilled DAT_fast vs exact parity" comparison is
#     in-protocol AND horizon-matched.
#  2. distill_24k — the shipped distillation recipe on the 24k schedule
#     ([8,16,8] teacher, w=0.5), matching the exact arm's horizon.
#  3. distill_exact_20k — recovery attempt #2: distill the fast student
#     from the EXACT-parity teacher (round-4 24k best checkpoint) instead
#     of the [8,16,8] mid-rung; teacher defaults to the exact
#     architecture when --teacher_shared/--teacher_samples are omitted.
#
#   nohup bash tools/tpu_queue_r4d.sh > /tmp/tpu_queue/driver_d.log 2>&1 &
#   echo $! > /tmp/tpu_queue/driver_d.pid
set -u
cd /root/repo
LOG=/tmp/tpu_queue
mkdir -p "$LOG"
RES=tools/quality/results

stamp() { date "+%H:%M:%S"; }
say() { echo "[$(stamp)] $*"; }
has_final() { [ -f "$1" ] && grep -q '"event": "final"' "$1"; }

# wait for the r4c driver (exact_24k resume session) to release the TPU
if [ -f "$LOG/driver_c.pid" ]; then
  CPID=$(cat "$LOG/driver_c.pid")
  while kill -0 "$CPID" 2>/dev/null; do sleep 30; done
fi
say "r4c released the TPU"

EXACT="$RES/DATwConstantnCv1_24k.jsonl"
for attempt in 1 2; do
  if has_final "$EXACT"; then break; fi
  say "stage exact_24k_finish (attempt $attempt): START"
  timeout 7200 python tools/quality/head_to_head.py \
    --model DATwConstantnCv1 --steps 24000 --resume \
    > "$LOG/exact_24k_finish$attempt.log" 2>&1
  say "stage exact_24k_finish (attempt $attempt): rc=$? (tail: $(tail -1 "$LOG/exact_24k_finish$attempt.log" 2>/dev/null | cut -c1-160))"
done
has_final "$EXACT" && say "exact_24k: FINAL reached" \
                   || say "exact_24k: still unfinished after 2 attempts"

DIST24="$RES/DATwConstantnCv1_shared_s8-8-2_distill0.5T8-16-8_24k.jsonl"
if ! has_final "$DIST24"; then
  say "stage distill_24k: START"
  timeout 9000 python tools/quality/head_to_head.py \
    --model DATwConstantnCv1 --shared --samples 8,8,2 --steps 24000 \
    --distill_from "$RES/DATwConstantnCv1_shared_s8-16-8_20k.best.ckpt" \
    --teacher_shared --teacher_samples 8,16,8 --resume \
    > "$LOG/distill_24k.log" 2>&1
  say "stage distill_24k: rc=$? (tail: $(tail -1 "$LOG/distill_24k.log" 2>/dev/null | cut -c1-160))"
else say "stage distill_24k: skip (final)"; fi

DISTX="$RES/DATwConstantnCv1_shared_s8-8-2_distill0.5_20k.jsonl"
if has_final "$EXACT" && [ -f "$RES/DATwConstantnCv1_24k.best.ckpt" ]; then
  if ! has_final "$DISTX"; then
    say "stage distill_exact_20k: START"
    timeout 10800 python tools/quality/head_to_head.py \
      --model DATwConstantnCv1 --shared --samples 8,8,2 --steps 20000 \
      --distill_from "$RES/DATwConstantnCv1_24k.best.ckpt" --resume \
      > "$LOG/distill_exact_20k.log" 2>&1
    say "stage distill_exact_20k: rc=$? (tail: $(tail -1 "$LOG/distill_exact_20k.log" 2>/dev/null | cut -c1-160))"
  else say "stage distill_exact_20k: skip (final)"; fi
else
  say "stage distill_exact_20k: skip (no exact 24k best ckpt yet)"
fi

say "queue r4d complete"
