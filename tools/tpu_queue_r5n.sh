#!/bin/bash
# Round-5 TPU queue, revision N — the tail of r5m, re-planned after the
# seed-123 6k-truncation read-out came in at +0.03 dB (distilled 34.905
# vs exact 34.876): the sign holds but the seed-42 margin (+0.52 @6k)
# does not replicate at the cheap truncation, and exact arms gain
# ~+0.6 dB from 6k to their ~15k best — so the truncation is
# inconclusive for the full-horizon headline claim. This revision
# spends the remaining budget on extending the seed-123 exact arm to
# its best-window (stop_at 15000; the completed seed-123 distilled arm
# peaked 35.346 @ 14.5k), funded by dropping the progressive probe and
# deferring the exact-best ckpt regen to last. Swapped in for r5m at a
# stage boundary (r5m stages 1-4 complete by then; same done-checks).
set -u
cd /root/repo
LOG=/tmp/tpu_queue
mkdir -p "$LOG"
RES=tools/quality/results
W1BEST="$RES/DATwConstantnCv1_shared_s8-8-2_distill1.0T8-16-8_24k.best.ckpt"
TEACHER="configs/teachers/DATwConstantnCv1_shared_s8-16-8.best.ckpt"
DEADLINE=$(date -d "2026-08-20 15:10" +%s)
STALL_S=600

stamp() { date "+%H:%M:%S"; }
say() { echo "[$(stamp)] $*"; }
left() { echo $(( DEADLINE - $(date +%s) )); }
has_final() { [ -f "$1" ] && grep -q '"event": "final"' "$1"; }
has_stop() { [ -f "$1" ] && grep -qE '"event": "(final|stop)"' "$1"; }

run_watched() {
  local budget="$1" lf="$2"; shift 2
  : > "$lf"
  "$@" > "$lf" 2>&1 &
  local pid=$!
  local t0=$(date +%s)
  while kill -0 "$pid" 2>/dev/null; do
    sleep 20
    local now=$(date +%s)
    local mt=$(stat -c %Y "$lf" 2>/dev/null || echo "$now")
    if [ $(( now - t0 )) -ge "$budget" ]; then
      say "  watchdog: budget ${budget}s expired, killing $pid"
      kill "$pid" 2>/dev/null; sleep 5; kill -9 "$pid" 2>/dev/null
      wait "$pid" 2>/dev/null; return 124
    fi
    if [ $(( now - mt )) -ge "$STALL_S" ]; then
      say "  watchdog: no output for ${STALL_S}s, killing $pid (stall)"
      kill "$pid" 2>/dev/null; sleep 5; kill -9 "$pid" 2>/dev/null
      wait "$pid" 2>/dev/null; return 125
    fi
  done
  wait "$pid"; return $?
}

# train_stage <name> <jsonl> <done_step> <min_left> <cap> <cmd...>
# done when the jsonl has a stop/final event OR an eval at >= done_step
# (lets a deadline-truncated extension still count once past the target).
train_stage() {
  local name="$1" jsonl="$2" done_step="$3" min_left="$4" cap="$5"; shift 5
  local tries=0
  while true; do
    if has_stop "$jsonl"; then
      local last=$(grep -oE '"step": [0-9]+' "$jsonl" | tail -1 | grep -oE '[0-9]+')
      if [ "${last:-0}" -ge "$done_step" ]; then say "stage $name: done (step $last)"; return 0; fi
    fi
    if [ "$(left)" -lt "$min_left" ]; then say "stage $name: skip (left $(left)s < ${min_left}s)"; return 1; fi
    if [ "$tries" -ge 5 ]; then say "stage $name: giving up after $tries tries"; return 1; fi
    local B=$(( $(left) - 120 )); [ "$B" -gt "$cap" ] && B="$cap"
    say "stage $name: START try=$tries (budget ${B}s)"
    run_watched "$B" "$LOG/$name.log" "$@"
    local rc=$?
    say "stage $name: rc=$rc (tail: $(tail -1 "$LOG/$name.log" 2>/dev/null | cut -c1-160))"
    tries=$(( tries + 1 ))
    [ "$rc" -eq 124 ] && return 1
    [ "$rc" -eq 125 ] && continue
  done
}

say "queue r5n starting ($(left)s to deadline)"

# 0. Per-instant PSNR/SSIM (retries, unlike r5m's one-shot): the r5m
#    attempt hit a backend stall mid-compile and was budget-killed.
#    eval_instants appends one row per (ckpt, t); done when the rt
#    checkpoint's rows are present. First prints can lag ~10 min
#    (7 pools + two remote compiles), so rc=125 stall kills just retry.
RTBEST="$RES/DATwConstantnCv1_shared_s8-8-2_distill1.0T8-16-8_rt125-875_24k.best.ckpt"
EI="$RES/eval_instants.jsonl"
tries=0
while [ -f "$W1BEST" ] && [ -f "$RTBEST" ]; do
  if grep -q "rt125-875" "$EI" 2>/dev/null; then say "stage instants: done"; break; fi
  if [ "$(left)" -lt 1500 ] || [ "$tries" -ge 3 ]; then say "stage instants: skip"; break; fi
  B=$(( $(left) - 120 )); [ "$B" -gt 2400 ] && B=2400
  say "stage instants: START try=$tries (budget ${B}s)"
  STALL_S=1200   # legit silent window: 7 pools + two remote compiles
  run_watched "$B" "$LOG/instants.log" \
    python tools/quality/eval_instants.py \
      --ckpt "$W1BEST" "$RTBEST" --shared --samples 8,8,2
  say "stage instants: rc=$? (tail: $(tail -1 "$LOG/instants.log" 2>/dev/null | cut -c1-200))"
  STALL_S=600
  tries=$(( tries + 1 ))
done

# 1. Extend the seed-123 exact arm 6000 -> 15000 (its stop-event at
#    6000 is superseded; --resume continues from the step-6000 ckpt).
#    Even a deadline-truncated partial at 11-13k answers the question.
train_stage s123_extend \
  "$RES/DATwConstantnCv1_seed123_24k.jsonl" \
  14500 2000 6600 \
  python tools/quality/head_to_head.py \
    --model DATwConstantnCv1 --steps 24000 --stop_at 15000 \
    --seed 123 --resume

# 2. Wide-student latency probe (VERDICT #6) — prices the arm below.
if [ ! -f "$LOG/wide_latency.json" ] && [ "$(left)" -ge 1500 ]; then
  B=$(( $(left) - 90 )); [ "$B" -gt 2700 ] && B=2700
  say "stage wide_latency: START (budget ${B}s)"
  run_watched "$B" "$LOG/wide_latency.log" \
    python tools/perf/wide_student_bench.py --hd
  rc=$?
  grep -h '^{' "$LOG/wide_latency.log" > "$LOG/wide_latency.json" || true
  say "stage wide_latency: rc=$rc (tail: $(tail -1 "$LOG/wide_latency.log" 2>/dev/null | cut -c1-160))"
else say "stage wide_latency: skip"; fi

# 3. Wide-student quality arm: nf=96 dec_res_blocks=5 distilled student.
train_stage wide_arm \
  "$RES/DATwConstantnCv1_shared_s8-8-2_dec5_distill1.0T8-16-8_nf96_24k.jsonl" \
  14500 2400 3200 \
  python tools/quality/head_to_head.py \
    --model DATwConstantnCv1 --shared --samples 8,8,2 --steps 24000 \
    --stop_at 15000 --nf 96 --dec_res_blocks 5 --teacher_nf 72 \
    --distill_from "$TEACHER" \
    --teacher_shared --teacher_samples 8,16,8 --distill_w 1.0 --resume

# 4. Exact-best ckpt regen (weak #1), if time remains.
RJ="$RES/DATwConstantnCv1_24k_regenbest.jsonl"
LASTSTEP=$(grep '"event": "eval"' "$RJ" 2>/dev/null | tail -1 \
           | sed 's/.*"step": \([0-9]*\).*/\1/')
LASTSTEP=${LASTSTEP:-0}
NEED=$(( (15500 - LASTSTEP) * 54 / 100 + 1100 ))
if ! has_stop "$RJ" && [ "$(left)" -ge $(( NEED + 150 )) ]; then
  train_stage regen_finish "$RJ" 15400 $(( NEED + 150 )) $(( NEED + 600 )) \
    python tools/quality/head_to_head.py \
      --model DATwConstantnCv1 --steps 24000 --stop_at 15500 \
      --tag_suffix _regenbest --resume
else say "stage regen_finish: skip (LASTSTEP=$LASTSTEP NEED=${NEED}s left=$(left)s)"; fi
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

# 5. Progressive probe only if everything else finished early.
J="$RES/DATwConstantnCv1_shared_s8-8-2_distill1.0T8-8-2_24k.jsonl"
if [ -f "$W1BEST" ]; then
  train_stage progressive "$J" 14500 2400 3000 \
    python tools/quality/head_to_head.py \
      --model DATwConstantnCv1 --shared --samples 8,8,2 --steps 24000 \
      --stop_at 15000 \
      --distill_from "$W1BEST" --teacher_shared --teacher_samples 8,8,2 \
      --distill_w 1.0 --resume
else say "stage progressive: skip (no W1BEST)"; fi

say "queue r5n complete ($(left)s to deadline)"
