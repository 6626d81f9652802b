#!/bin/bash
# Round-5 TPU queue, revision L — r5k with STALL_S=600 (stalls recur every ~72-74 min, always right after an eval+save; the max legitimate quiet window today is ~300 s, so 600 s halves the per-stall waste). Previous fixes:
#  - stage 2's jsonl held a PLACEHOLDER final event (left by the
#    superseded r5c plan), so r5j's done-check skipped the real
#    seed-123 exact arm; the placeholder is now removed before the
#    stage runs.
#  - stage 0 adopts the w1best_regen python orphaned by the r5j driver
#    swap (waits on its PID with the same quiet-log stall kill).
#
# The tunneled TPU backend stalled twice today (05:11, 06:23), both
# times immediately after an eval+ckpt-save cycle ~25-35 min into a
# run: the client blocks forever in a futex on an RPC that never
# returns, and the stage then burns the rest of its fixed timeout doing
# nothing (stall 1 wasted ~38 min, stall 2 ~26 min). head_to_head
# checkpoints at every eval, so progress is durable — the right policy
# is: watch the stage's stdout; if it goes quiet for STALL_S seconds,
# kill that specific PID and retry the same command (--resume picks up
# from the last eval's ckpt, sampler fast-forwarded, byte-identical
# stream). Quiet thresholds: evals print every ~35 s (fast arms) /
# ~270 s (exact arms); the longest legitimately-quiet phase is an
# uncached remote compile (~600 s) — 900 s catches a stall in 15 min
# with no false positives.
#
# Stage list and budgets: see r5i. Stage 1 (s123_w1) resumes from step
# 15000 (stall 2's last ckpt).
#
#   nohup bash tools/tpu_queue_r5j.sh > /tmp/tpu_queue/driver_r5j.log 2>&1 &
set -u
cd /root/repo
LOG=/tmp/tpu_queue
mkdir -p "$LOG"
RES=tools/quality/results
W1BEST="$RES/DATwConstantnCv1_shared_s8-8-2_distill1.0T8-16-8_24k.best.ckpt"
TEACHER="configs/teachers/DATwConstantnCv1_shared_s8-16-8.best.ckpt"
DEADLINE=$(date -d "2026-08-20 11:00" +%s)
STALL_S=600

stamp() { date "+%H:%M:%S"; }
say() { echo "[$(stamp)] $*"; }
left() { echo $(( DEADLINE - $(date +%s) )); }
has_final() { [ -f "$1" ] && grep -q '"event": "final"' "$1"; }
has_stop() { [ -f "$1" ] && grep -qE '"event": "(final|stop)"' "$1"; }
has_eval() { [ -f "$1" ] && grep -q '"event": "eval"' "$1"; }

# run_watched <budget_s> <logfile> <cmd...>
# Runs cmd with stdout/stderr -> logfile, kills it if the log is quiet
# for STALL_S or the budget expires. Returns cmd's rc, 124 on budget
# kill, 125 on stall kill.
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

# train_stage <name> <jsonl> <done_check:final|stop> <min_left> <cap> <cmd...>
# Retries on stall (rc 125) while the done-event is absent and time
# remains; --resume in cmd makes each retry continue from the last ckpt.
train_stage() {
  local name="$1" jsonl="$2" done_ev="$3" min_left="$4" cap="$5"; shift 5
  local tries=0
  while true; do
    if [ "$done_ev" = final ] && has_final "$jsonl"; then say "stage $name: done"; return 0; fi
    if [ "$done_ev" = stop ] && has_stop "$jsonl"; then say "stage $name: done"; return 0; fi
    if [ "$(left)" -lt "$min_left" ]; then say "stage $name: skip (left $(left)s < ${min_left}s)"; return 1; fi
    if [ "$tries" -ge 4 ]; then say "stage $name: giving up after $tries tries"; return 1; fi
    local B=$(( $(left) - 120 )); [ "$B" -gt "$cap" ] && B="$cap"
    say "stage $name: START try=$tries (budget ${B}s)"
    run_watched "$B" "$LOG/$name.log" "$@"
    local rc=$?
    say "stage $name: rc=$rc (tail: $(tail -1 "$LOG/$name.log" 2>/dev/null | cut -c1-160))"
    tries=$(( tries + 1 ))
    [ "$rc" -eq 124 ] && return 1   # budget kill: no point retrying
    [ "$rc" -eq 125 ] && continue    # stall: retry, resume from ckpt
    # normal exit: loop re-checks the done event (a timeout'd partial
    # without the event retries too, same as a stall)
  done
}

say "queue r5l starting ($(left)s to deadline)"

# 0. Adopt the orphaned w1best_regen process: wait for it, stall-kill
#    it by PID if its log goes quiet (its r5j watchdog died with the
#    old driver).
PRIOR_PID="${1:-}"
PRIOR_LOG="${2:-/tmp/tpu_queue/s123_exact_6k.log}"
while [ -n "$PRIOR_PID" ] && [ -d "/proc/$PRIOR_PID" ]; do
  sleep 20
  NOW=$(date +%s)
  MT=$(stat -c %Y "$PRIOR_LOG" 2>/dev/null || echo "$NOW")
  if [ $(( NOW - MT )) -ge "$STALL_S" ]; then
    say "stage 0: orphan $PRIOR_PID quiet ${STALL_S}s, killing"
    kill "$PRIOR_PID" 2>/dev/null; sleep 5; kill -9 "$PRIOR_PID" 2>/dev/null
    break
  fi
done
say "stage 0: orphan drained ($(left)s left)"

# 1. Second-seed distilled w=1.0 arm, FULL 24k (resumes from step 15000).
train_stage s123_w1 \
  "$RES/DATwConstantnCv1_shared_s8-8-2_distill1.0T8-16-8_seed123_24k.jsonl" \
  final 1500 3600 \
  python tools/quality/head_to_head.py \
    --model DATwConstantnCv1 --shared --samples 8,8,2 --steps 24000 \
    --seed 123 --distill_from "$TEACHER" \
    --teacher_shared --teacher_samples 8,16,8 --distill_w 1.0 --resume

# 2. Second-seed exact-parity arm, stop_at 6000 on the 24k schedule
#    (seed-42 margin at the 6k truncation: +0.52 dB). Drop the
#    placeholder jsonl (fake final event) before the done-check.
J2="$RES/DATwConstantnCv1_seed123_24k.jsonl"
if [ -f "$J2" ] && grep -q placeholder "$J2"; then rm -f "$J2"; fi
train_stage s123_exact_6k \
  "$RES/DATwConstantnCv1_seed123_24k.jsonl" \
  stop 3800 4600 \
  python tools/quality/head_to_head.py \
    --model DATwConstantnCv1 --steps 24000 --stop_at 6000 \
    --seed 123 --resume

# 3. Regenerate the shipped winner's best checkpoint (artifact-policy
#    exception; eval_best re-scored it 39.0322 @ 14500 before the file
#    was lost). Deterministic truncated rerun.
RJ="$RES/DATwConstantnCv1_shared_s8-8-2_distill1.0T8-16-8_24k_w1regen.jsonl"
if [ ! -f "$W1BEST" ]; then
  train_stage w1best_regen "$RJ" stop 2100 2700 \
    python tools/quality/head_to_head.py \
      --model DATwConstantnCv1 --shared --samples 8,8,2 --steps 24000 \
      --stop_at 14500 --tag_suffix _w1regen --resume \
      --distill_from "$TEACHER" \
      --teacher_shared --teacher_samples 8,16,8 --distill_w 1.0
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
else say "stage w1best_regen: skip (artifact exists)"; fi

# 4. Multi-instant arm: distilled w=1.0, train-pool t ~ U[0.125, 0.875]
#    (covers the factor-8 serving grid); held-out eval stays t=0.5.
#    Deadline-truncated partial still usable at its best eval, so the
#    min_left gate is low and the cap leaves room for stage 5.
J="$RES/DATwConstantnCv1_shared_s8-8-2_distill1.0T8-16-8_rt125-875_24k.jsonl"
if ! has_eval "$J"; then rm -f "$J"; fi
RTCAP=$(( $(left) - 1500 )); [ "$RTCAP" -gt 3600 ] && RTCAP=3600
[ "$RTCAP" -lt 1800 ] && RTCAP=1800
train_stage rt_arm "$J" final 2400 "$RTCAP" \
  python tools/quality/head_to_head.py \
    --model DATwConstantnCv1 --shared --samples 8,8,2 --steps 24000 \
    --random_t 0.125,0.875 --distill_from "$TEACHER" \
    --teacher_shared --teacher_samples 8,16,8 --distill_w 1.0 --resume

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
  run_watched "$B" "$LOG/instants.log" \
    python tools/quality/eval_instants.py \
      --ckpt "${G2[@]}" --shared --samples 8,8,2
  say "stage instants: rc=$? (tail: $(tail -1 "$LOG/instants.log" 2>/dev/null | cut -c1-200))"
else say "stage instants: skip"; fi

# 6. Finish the exact-best regen — dynamic gate on the time actually
#    needed from the curve's last eval step (0.54 s/step + ~1.1 ks
#    startup); a partial is useless, so skip outright if it can't fit.
RJ="$RES/DATwConstantnCv1_24k_regenbest.jsonl"
LASTSTEP=$(grep '"event": "eval"' "$RJ" 2>/dev/null | tail -1 \
           | sed 's/.*"step": \([0-9]*\).*/\1/')
LASTSTEP=${LASTSTEP:-0}
NEED=$(( (15500 - LASTSTEP) * 54 / 100 + 1100 ))
if ! has_stop "$RJ" && [ "$(left)" -ge $(( NEED + 150 )) ]; then
  train_stage regen_finish "$RJ" stop $(( NEED + 150 )) $(( NEED + 600 )) \
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

# 7. Slack-only probes.
if [ ! -f "$LOG/ifrnet_sweep.json" ] && [ "$(left)" -ge 1500 ]; then
  B=$(( $(left) - 90 )); [ "$B" -gt 3600 ] && B=3600
  say "stage ifrnet_sweep: START (budget ${B}s)"
  run_watched "$B" "$LOG/ifrnet_sweep.log" \
    python tools/perf/ifrnet_batch_sweep.py
  rc=$?
  grep -h '^{' "$LOG/ifrnet_sweep.log" > "$LOG/ifrnet_sweep.json" || true
  say "stage ifrnet_sweep: rc=$rc (tail: $(tail -1 "$LOG/ifrnet_sweep.log" 2>/dev/null | cut -c1-160))"
else say "stage ifrnet_sweep: skip"; fi
if [ ! -f "$LOG/wide_latency.json" ] && [ "$(left)" -ge 1500 ]; then
  B=$(( $(left) - 90 )); [ "$B" -gt 2700 ] && B=2700
  say "stage wide_latency: START (budget ${B}s)"
  run_watched "$B" "$LOG/wide_latency.log" \
    python tools/perf/wide_student_bench.py
  rc=$?
  grep -h '^{' "$LOG/wide_latency.log" > "$LOG/wide_latency.json" || true
  say "stage wide_latency: rc=$rc (tail: $(tail -1 "$LOG/wide_latency.log" 2>/dev/null | cut -c1-160))"
else say "stage wide_latency: skip"; fi
J="$RES/DATwConstantnCv1_shared_s8-8-2_distill1.0T8-8-2_24k.jsonl"
if [ -f "$W1BEST" ] && [ "$(left)" -ge 3000 ]; then
  train_stage progressive_24k "$J" final 3000 3600 \
    python tools/quality/head_to_head.py \
      --model DATwConstantnCv1 --shared --samples 8,8,2 --steps 24000 \
      --distill_from "$W1BEST" --teacher_shared --teacher_samples 8,8,2 \
      --distill_w 1.0 --resume
else say "stage progressive_24k: skip"; fi

say "queue r5l complete ($(left)s to deadline)"
