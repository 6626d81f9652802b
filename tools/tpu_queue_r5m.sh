#!/bin/bash
# Round-5 TPU queue, revision M — fresh-VM restart of r5l (the VM was
# recycled at 04:05 killing the r5l driver mid-stage). Same stall
# policy (STALL_S=600; the tunneled backend stalls ~every 73 min right
# after an eval+save; head_to_head checkpoints at every eval so kill+
# --resume loses <=600 s). Changes vs r5l:
#  - stages reordered by VERDICT impact: flagship ckpt regen, then the
#    seed-123 exact arm (two-seed confirmation), then the random-t
#    multi-instant arm + per-instant eval (missing #2), then the
#    exact-best regen (weak #1), then the wide-student probe+arm
#    (VERDICT #6), then progressive distillation (#7).
#  - probe arms (rt, wide, progressive) run with --stop_at 15000: every
#    completed arm's best lands at 13-15.5k, so the 15k truncation
#    keeps the best-PSNR reading at ~60% of the 24k cost.
#
#   nohup bash tools/tpu_queue_r5m.sh > /tmp/tpu_queue/driver_r5m.log 2>&1 &
set -u
cd /root/repo
LOG=/tmp/tpu_queue
mkdir -p "$LOG"
RES=tools/quality/results
W1BEST="$RES/DATwConstantnCv1_shared_s8-8-2_distill1.0T8-16-8_24k.best.ckpt"
TEACHER="configs/teachers/DATwConstantnCv1_shared_s8-16-8.best.ckpt"
DEADLINE=$(date -d "2026-08-20 15:00" +%s)
STALL_S=600

stamp() { date "+%H:%M:%S"; }
say() { echo "[$(stamp)] $*"; }
left() { echo $(( DEADLINE - $(date +%s) )); }
has_final() { [ -f "$1" ] && grep -q '"event": "final"' "$1"; }
has_stop() { [ -f "$1" ] && grep -qE '"event": "(final|stop)"' "$1"; }
has_eval() { [ -f "$1" ] && grep -q '"event": "eval"' "$1"; }

# run_watched <budget_s> <logfile> <cmd...>
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
train_stage() {
  local name="$1" jsonl="$2" done_ev="$3" min_left="$4" cap="$5"; shift 5
  local tries=0
  while true; do
    if [ "$done_ev" = final ] && has_final "$jsonl"; then say "stage $name: done"; return 0; fi
    if [ "$done_ev" = stop ] && has_stop "$jsonl"; then say "stage $name: done"; return 0; fi
    if [ "$(left)" -lt "$min_left" ]; then say "stage $name: skip (left $(left)s < ${min_left}s)"; return 1; fi
    if [ "$tries" -ge 5 ]; then say "stage $name: giving up after $tries tries"; return 1; fi
    local B=$(( $(left) - 120 )); [ "$B" -gt "$cap" ] && B="$cap"
    say "stage $name: START try=$tries (budget ${B}s)"
    run_watched "$B" "$LOG/$name.log" "$@"
    local rc=$?
    say "stage $name: rc=$rc (tail: $(tail -1 "$LOG/$name.log" 2>/dev/null | cut -c1-160))"
    tries=$(( tries + 1 ))
    [ "$rc" -eq 124 ] && return 1   # budget kill: no point retrying
    [ "$rc" -eq 125 ] && continue    # stall: retry, resume from ckpt
  done
}

say "queue r5m starting ($(left)s to deadline)"

# 1. Regenerate the shipped winner's best checkpoint (resumes from the
#    step-4000 ckpt left by the crashed VM). Deterministic truncated
#    rerun; eval_best re-scored the lost file 39.0322 @ 14500.
RJ="$RES/DATwConstantnCv1_shared_s8-8-2_distill1.0T8-16-8_24k_w1regen.jsonl"
if [ ! -f "$W1BEST" ]; then
  train_stage w1best_regen "$RJ" stop 1500 2700 \
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

# 2. Second-seed exact-parity arm, stop_at 6000 on the 24k schedule
#    (resumes from step 1000). Seed-42 margin at the 6k truncation:
#    +0.52 dB distilled-over-exact.
train_stage s123_exact_6k \
  "$RES/DATwConstantnCv1_seed123_24k.jsonl" \
  stop 2500 4600 \
  python tools/quality/head_to_head.py \
    --model DATwConstantnCv1 --steps 24000 --stop_at 6000 \
    --seed 123 --resume

# 3. Multi-instant arm: distilled w=1.0, train-pool t ~ U[0.125, 0.875]
#    (covers the factor-8 serving grid); held-out eval stays t=0.5.
#    stop_at 15000: bests land 13-15.5k on every completed arm.
J="$RES/DATwConstantnCv1_shared_s8-8-2_distill1.0T8-16-8_rt125-875_24k.jsonl"
train_stage rt_arm "$J" stop 1800 3000 \
  python tools/quality/head_to_head.py \
    --model DATwConstantnCv1 --shared --samples 8,8,2 --steps 24000 \
    --stop_at 15000 \
    --random_t 0.125,0.875 --distill_from "$TEACHER" \
    --teacher_shared --teacher_samples 8,16,8 --distill_w 1.0 --resume

# 4. Per-instant PSNR/SSIM: shipped (t=0.5 trained) w=1.0 best vs the
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

# 5. Finish the exact-best regen (resumes from 11500; target 15500 @
#    38.1769). Dynamic gate: 0.54 s/step + ~1.1 ks startup.
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

# 6. Wide-student latency probe (VERDICT #6; CANDIDATES ladder incl.
#    720p) — prices the quality arm that follows.
if [ ! -f "$LOG/wide_latency.json" ] && [ "$(left)" -ge 1500 ]; then
  B=$(( $(left) - 90 )); [ "$B" -gt 2700 ] && B=2700
  say "stage wide_latency: START (budget ${B}s)"
  run_watched "$B" "$LOG/wide_latency.log" \
    python tools/perf/wide_student_bench.py --hd
  rc=$?
  grep -h '^{' "$LOG/wide_latency.log" > "$LOG/wide_latency.json" || true
  say "stage wide_latency: rc=$rc (tail: $(tail -1 "$LOG/wide_latency.log" 2>/dev/null | cut -c1-160))"
else say "stage wide_latency: skip"; fi

# 7. Wide-student quality arm: nf=96 dec_res_blocks=5 distilled student
#    (the roofline's lane-fill pick), same teacher/protocol.
J="$RES/DATwConstantnCv1_shared_s8-8-2_dec5_distill1.0T8-16-8_nf96_24k.jsonl"
train_stage wide_arm "$J" stop 2400 3200 \
  python tools/quality/head_to_head.py \
    --model DATwConstantnCv1 --shared --samples 8,8,2 --steps 24000 \
    --stop_at 15000 --nf 96 --dec_res_blocks 5 --teacher_nf 72 \
    --distill_from "$TEACHER" \
    --teacher_shared --teacher_samples 8,16,8 --distill_w 1.0 --resume

# 8. Progressive distillation probe: teacher = the w=1.0 student.
J="$RES/DATwConstantnCv1_shared_s8-8-2_distill1.0T8-8-2_24k.jsonl"
if [ -f "$W1BEST" ]; then
  train_stage progressive "$J" stop 2400 3000 \
    python tools/quality/head_to_head.py \
      --model DATwConstantnCv1 --shared --samples 8,8,2 --steps 24000 \
      --stop_at 15000 \
      --distill_from "$W1BEST" --teacher_shared --teacher_samples 8,8,2 \
      --distill_w 1.0 --resume
else say "stage progressive: skip (no W1BEST)"; fi

say "queue r5m complete ($(left)s to deadline)"
