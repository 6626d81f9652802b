#!/bin/bash
# Round-4 TPU queue, revision B (ONE TPU process at a time — CLAUDE.md).
#
# Replaces the tail of tpu_queue_r4.sh after measuring the exact-parity
# arm at ~1.05 s/step: a from-scratch 24k exact teacher costs ~7 h — it
# cannot fit the round. Revised plan: the distillation teacher is the
# COMPLETED [8,16,8] horizon arm (best 38.01 dB, 0.21 dB below exact's
# 38.22, at ~1/10 the training cost), and the comparison cohort stays on
# the 20k schedule where exact (r3, 18k reached), [8,16,8], and [8,8,4]
# curves already exist.
#
#   nohup bash tools/tpu_queue_r4b.sh > /tmp/tpu_queue/driver_b.log 2>&1 &
set -u
cd /root/repo
LOG=/tmp/tpu_queue
mkdir -p "$LOG"
RES=tools/quality/results
PERF=tools/perf/results

stamp() { date "+%H:%M:%S"; }
say() { echo "[$(stamp)] $*"; }
has_final() { [ -f "$1" ] && grep -q '"event": "final"' "$1"; }

run_stage() { # name timeout_s cmd...
  local name=$1 tmo=$2; shift 2
  say "stage $name: START ($*)"
  timeout "$tmo" "$@" > "$LOG/$name.log" 2>&1
  local rc=$?
  say "stage $name: rc=$rc (tail: $(tail -1 "$LOG/$name.log" 2>/dev/null | cut -c1-160))"
  return $rc
}

TEACHER="$RES/DATwConstantnCv1_shared_s8-16-8_20k.best.ckpt"
DISTILL_OUT="$RES/DATwConstantnCv1_shared_s8-8-2_distill0.5T8-16-8_20k.jsonl"

# 1. distillation recovery arm (VERDICT #1b): DAT_fast student, the
#    completed [8,16,8] arm's best checkpoint as teacher, 20k schedule.
if ! has_final "$DISTILL_OUT"; then
  run_stage distill_20k 7200 python tools/quality/head_to_head.py \
    --model DATwConstantnCv1 --shared --samples 8,8,2 --steps 20000 \
    --distill_from "$TEACHER" --teacher_shared --teacher_samples 8,16,8 \
    --resume
else say "stage distill_20k: skip (final)"; fi

# 2. no-teacher control: fresh FULL 20k [8,8,2] (the round-3 arm stopped
#    at 15k; archive its partial curve once, then rerun to completion).
CTRL="$RES/DATwConstantnCv1_shared_s8-8-2_20k.jsonl"
if [ -f "$CTRL" ] && ! has_final "$CTRL" && \
   [ ! -f "$RES/DATwConstantnCv1_shared_s8-8-2_20k.r3partial.jsonl" ]; then
  mv "$CTRL" "$RES/DATwConstantnCv1_shared_s8-8-2_20k.r3partial.jsonl"
fi
if ! has_final "$CTRL"; then
  run_stage s8-8-2_20k 7200 python tools/quality/head_to_head.py \
    --model DATwConstantnCv1 --shared --samples 8,8,2 --steps 20000 --resume
else say "stage s8-8-2_20k: skip (final)"; fi

# 3. warp-gather coherence probe (roofline gather-rate calibration)
if [ ! -f "$PERF/gather_rates.json" ]; then
  run_stage warpgather 2400 python tools/perf/warp_gather_probe.py
else say "stage warpgather: skip (exists)"; fi

# 4. membw retry at smaller size (first attempt timed out at 256 MB)
if [ ! -f "$PERF/membw.json" ]; then
  run_stage membw_retry 2400 python tools/perf/membw_probe.py --mb 64
else say "stage membw_retry: skip (exists)"; fi

# 5. [8,8,2] 24k arm (VERDICT #8: a curve genuinely past 20k)
if ! has_final "$RES/DATwConstantnCv1_shared_s8-8-2_24k.jsonl"; then
  run_stage s8-8-2_24k 7200 python tools/quality/head_to_head.py \
    --model DATwConstantnCv1 --shared --samples 8,8,2 --steps 24000 --resume
else say "stage s8-8-2_24k: skip (final)"; fi

# 6. final bench suite (after any config re-pick lands)
run_stage bench 5400 env BENCH_BUDGET_S=4200 python bench.py

say "queue r4b complete"
