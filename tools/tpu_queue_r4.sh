#!/bin/bash
# Round-4 sequential TPU queue (ONE TPU process at a time — CLAUDE.md).
# Idempotent: stages whose outputs already exist are skipped, quality arms
# resume from their checkpoints, so the script survives VM restarts.
#
#   nohup bash tools/tpu_queue_r4.sh > /tmp/tpu_queue/driver.log 2>&1 &
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

# 1. HBM bandwidth probe (roofline calibration)
if [ ! -f "$PERF/membw.json" ]; then
  run_stage membw 1200 python tools/perf/membw_probe.py
else say "stage membw: skip (exists)"; fi

# 2. conv TF/s-vs-channels sweep (roofline calibration)
if [ ! -f "$PERF/conv_ceilings.json" ]; then
  run_stage convsweep 5400 python tools/perf/conv_channel_sweep.py
else say "stage convsweep: skip (exists)"; fi

# 3. [8,16,8] 20k horizon arm (VERDICT #1a — killed by VM restart, restart)
if ! has_final "$RES/DATwConstantnCv1_shared_s8-16-8_20k.jsonl"; then
  run_stage s8-16-8_20k 10800 python tools/quality/head_to_head.py \
    --model DATwConstantnCv1 --shared --samples 8,16,8 --steps 20000 --resume
else say "stage s8-16-8_20k: skip (final)"; fi

# 4. exact-parity 24k arm (VERDICT #8 past-20k + distillation teacher)
if ! has_final "$RES/DATwConstantnCv1_24k.jsonl"; then
  run_stage exact_24k 14400 python tools/quality/head_to_head.py \
    --model DATwConstantnCv1 --steps 24000 --resume
else say "stage exact_24k: skip (final)"; fi

# 5. [8,8,2] 24k arm (VERDICT #8 + the distill arm's no-teacher control)
if ! has_final "$RES/DATwConstantnCv1_shared_s8-8-2_24k.jsonl"; then
  run_stage s8-8-2_24k 10800 python tools/quality/head_to_head.py \
    --model DATwConstantnCv1 --shared --samples 8,8,2 --steps 24000 --resume
else say "stage s8-8-2_24k: skip (final)"; fi

# 6. distillation recovery arm (VERDICT #1b): DAT_fast student, best exact
#    teacher, same 24k schedule/batches as its control above.
TEACHER="$RES/DATwConstantnCv1_24k.best.ckpt"
if ! has_final "$RES/DATwConstantnCv1_shared_s8-8-2_distill0.5_24k.jsonl"; then
  if [ -f "$TEACHER" ]; then
    run_stage distill_24k 14400 python tools/quality/head_to_head.py \
      --model DATwConstantnCv1 --shared --samples 8,8,2 --steps 24000 \
      --distill_from "$TEACHER" --resume
  else say "stage distill_24k: SKIP — no teacher at $TEACHER"; fi
else say "stage distill_24k: skip (final)"; fi

# 7. [8,8,4] 24k arm (ladder consistency at the 24k schedule; optional)
if ! has_final "$RES/DATwConstantnCv1_shared_s8-8-4_24k.jsonl"; then
  run_stage s8-8-4_24k 10800 python tools/quality/head_to_head.py \
    --model DATwConstantnCv1 --shared --samples 8,8,4 --steps 24000 --resume
else say "stage s8-8-4_24k: skip (final)"; fi

# 8. final bench suite (updates BENCH_SUITE.json)
run_stage bench 5400 env BENCH_BUDGET_S=4200 python bench.py

say "queue complete"

# 9. warp-gather coherence probe (added mid-round: roofline gather-rate
#    calibration — smooth/random/deform index regimes)
if [ ! -f "$PERF/gather_rates.json" ]; then
  run_stage warpgather 2400 python tools/perf/warp_gather_probe.py
else say "stage warpgather: skip (exists)"; fi

say "queue complete (incl. appended stages)"

# 10. membw retry at smaller size (first attempt timed out at 256 MB)
if [ ! -f "$PERF/membw.json" ]; then
  run_stage membw_retry 2400 python tools/perf/membw_probe.py --mb 64
else say "stage membw_retry: skip (exists)"; fi
say "queue fully complete"

# 11. [8,16,8] 24k arm (appended: completes the 24k-schedule cohort with
#     the quality-leading fast rung from the 20k study)
if ! has_final "$RES/DATwConstantnCv1_shared_s8-16-8_24k.jsonl"; then
  run_stage s8-16-8_24k 10800 python tools/quality/head_to_head.py \
    --model DATwConstantnCv1 --shared --samples 8,16,8 --steps 24000 --resume
else say "stage s8-16-8_24k: skip (final)"; fi
say "queue fully complete v2"
