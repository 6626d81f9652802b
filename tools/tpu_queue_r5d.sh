#!/bin/bash
# Round-5 TPU queue, revision D (chains after tpu_queue_r5a.sh; replaces
# the killed r5c). Final-round budget: every stage is gated on a hard
# DEADLINE so the TPU is free before the driver's end-of-round bench.py
# (one TPU process at a time — a collision would poison the headline).
#
# Stages, by value-per-TPU-minute under the deadline:
#  1. regen restore    — guarded copy of the regenerated exact best
#  2. seed123_exact    — second-seed exact arm, --stop_at 12000 on the
#     unchanged 24k schedule (0.54 s/step makes 18k+ unaffordable; the
#     matched-truncation comparison vs the full seed-123 distilled arm is
#     best-through-12k vs best-through-12k, documented in BENCH_NOTES)
#  3. ifrnet_sweep     — b=1..16 ladder + attribution (VERDICT #5)
#  4. wide_latency     — price the wide-student candidates (VERDICT #6)
#  5. progressive      — distill from the w=1.0 student (VERDICT #7;
#     bounded, resume-capable, partial curve acceptable)
#  6. eval_best        — PSNR+SSIM re-scores of the new bests
#
#   nohup bash tools/tpu_queue_r5d.sh > /tmp/tpu_queue/driver_r5d.log 2>&1 &
#   echo $! > /tmp/tpu_queue/driver_r5d.pid
set -u
cd /root/repo
LOG=/tmp/tpu_queue
mkdir -p "$LOG"
RES=tools/quality/results
W1BEST="$RES/DATwConstantnCv1_shared_s8-8-2_distill1.0T8-16-8_24k.best.ckpt"
DEADLINE=$(date -d "2026-08-20 07:05" +%s)

stamp() { date "+%H:%M:%S"; }
say() { echo "[$(stamp)] $*"; }
has_final() { [ -f "$1" ] && grep -q '"event": "final"' "$1"; }
has_stop() { [ -f "$1" ] && grep -qE '"event": "(final|stop)"' "$1"; }
past_deadline() { [ "$(date +%s)" -ge "$DEADLINE" ]; }

if [ -f "$LOG/driver_r5a.pid" ]; then
  APID=$(cat "$LOG/driver_r5a.pid")
  while kill -0 "$APID" 2>/dev/null; do sleep 30; done
fi
say "r5a released the TPU"

# 1. Finish + restore the exact-best regen.
RJ="$RES/DATwConstantnCv1_24k_regenbest.jsonl"
if ! has_stop "$RJ" && ! past_deadline; then
  say "stage regen_finish: START"
  timeout 10800 python tools/quality/head_to_head.py \
    --model DATwConstantnCv1 --steps 24000 --stop_at 15500 \
    --tag_suffix _regenbest --resume \
    > "$LOG/exact_regen2.log" 2>&1
  say "stage regen_finish: rc=$? (tail: $(tail -1 "$LOG/exact_regen2.log" 2>/dev/null | cut -c1-160))"
fi
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

# 2. Second-seed exact-parity arm, truncated at 12k on the 24k schedule.
J="$RES/DATwConstantnCv1_seed123_24k.jsonl"
if grep -q "placeholder" "$J" 2>/dev/null; then rm -f "$J"; fi
if ! has_stop "$J" && ! past_deadline; then
  say "stage seed123_exact_12k: START"
  timeout 10800 python tools/quality/head_to_head.py \
    --model DATwConstantnCv1 --steps 24000 --stop_at 12000 \
    --seed 123 --resume \
    > "$LOG/exact_s123.log" 2>&1
  say "stage seed123_exact_12k: rc=$? (tail: $(tail -1 "$LOG/exact_s123.log" 2>/dev/null | cut -c1-160))"
else say "stage seed123_exact_12k: skip"; fi

# 3. IFRNet batch ladder + attribution.
if [ ! -f "$LOG/ifrnet_sweep.json" ] && ! past_deadline; then
  say "stage ifrnet_sweep: START"
  timeout 5400 python tools/perf/ifrnet_batch_sweep.py \
    > "$LOG/ifrnet_sweep.log" 2>&1
  rc=$?
  grep -h '^{' "$LOG/ifrnet_sweep.log" > "$LOG/ifrnet_sweep.json" || true
  say "stage ifrnet_sweep: rc=$rc (tail: $(tail -1 "$LOG/ifrnet_sweep.log" 2>/dev/null | cut -c1-160))"
else say "stage ifrnet_sweep: skip"; fi

# 4. Wide-student latency ladder.
if [ ! -f "$LOG/wide_latency.json" ] && ! past_deadline; then
  say "stage wide_latency: START"
  timeout 3600 python tools/perf/wide_student_bench.py \
    > "$LOG/wide_latency.log" 2>&1
  rc=$?
  grep -h '^{' "$LOG/wide_latency.log" > "$LOG/wide_latency.json" || true
  say "stage wide_latency: rc=$rc (tail: $(tail -1 "$LOG/wide_latency.log" 2>/dev/null | cut -c1-160))"
else say "stage wide_latency: skip"; fi

# 5. Progressive distillation: teacher = the w=1.0 student. Bounded and
#    resume-capable; a partial curve still answers compound-vs-saturate.
J="$RES/DATwConstantnCv1_shared_s8-8-2_distill1.0T8-8-2_24k.jsonl"
if [ -f "$W1BEST" ] && ! has_final "$J" && ! past_deadline; then
  say "stage progressive_24k: START"
  timeout 4500 python tools/quality/head_to_head.py \
    --model DATwConstantnCv1 --shared --samples 8,8,2 --steps 24000 \
    --distill_from "$W1BEST" --teacher_shared --teacher_samples 8,8,2 \
    --distill_w 1.0 --resume \
    > "$LOG/progressive_24k.log" 2>&1
  say "stage progressive_24k: rc=$? (tail: $(tail -1 "$LOG/progressive_24k.log" 2>/dev/null | cut -c1-160))"
else say "stage progressive_24k: skip"; fi

# 6. Re-scores of the new s8-8-2 bests (one compile).
G1=()
for f in \
  "$RES/DATwConstantnCv1_shared_s8-8-2_distill1.5T8-16-8_24k.best.ckpt" \
  "$RES/DATwConstantnCv1_shared_s8-8-2_distill2.0T8-16-8_24k.best.ckpt" \
  "$RES/DATwConstantnCv1_shared_s8-8-2_distill1.0T8-16-8_rt125-875_24k.best.ckpt" \
  "$RES/DATwConstantnCv1_shared_s8-8-2_distill1.0T8-8-2_24k.best.ckpt"; do
  [ -f "$f" ] && G1+=("$f")
done
if [ "${#G1[@]}" -gt 0 ] && ! past_deadline; then
  say "stage eval_r5_s882 (${#G1[@]} ckpts): START"
  timeout 2400 python tools/quality/eval_best.py \
    --ckpt "${G1[@]}" --shared --samples 8,8,2 \
    > "$LOG/eval_r5_s882.log" 2>&1
  say "stage eval_r5_s882: rc=$? (tail: $(tail -1 "$LOG/eval_r5_s882.log" 2>/dev/null | cut -c1-200))"
else say "stage eval_r5_s882: skip"; fi

say "queue r5d complete"
