#!/bin/bash
# Round-5 TPU queue, revision F — the continuation session's plan.
# The r5e queue died with the VM restart; /tmp (and its stage logs) was
# wiped, but every completed stage left its results in
# tools/quality/results/, so each stage below re-gates on those.
#
# Measured costs this queue is budgeted from (marginal s/step read from
# contiguous curve stretches, NOT curve-wide elapsed_s — elapsed_s resets
# per process across resumes):
#   exact-parity arm       0.54 s/step  -> 10k-truncated run ~6.1 ks
#   distilled fast arm     0.070 s/step -> full 24k arm      ~2.6 ks
#   plain fast arm         0.043 s/step
#
# Stages, by VERDICT-r4 priority:
#  1. regen_finish  — finish exact-best regen 11.5k -> 15.5k + guarded
#                     restore of the committed best ckpt     [weak #1]
#  2. s123_w1       — second-seed distilled w=1.0 arm, FULL 24k
#                     (cheap: ~2.6 ks)                       [item #1]
#  3. s123_exact    — second-seed exact arm, --stop_at 10000
#                     (matched truncation; seed-42 margin through 10k
#                     is +0.93 dB vs +0.85 at horizon)       [item #1]
#  4. rt_arm        — distilled w=1.0 + random_t 0.125-0.875 [item #4]
#  5. ifrnet_sweep  — b=1..16 ladder + attribution           [item #5]
#  6. instants      — per-instant PSNR of rt arm vs shipped  [item #4]
#  7. progressive   — distill from the w=1.0 student         [item #7]
#  8. wide_latency  — price wide-student candidates          [item #6]
#  9. eval_r5       — PSNR+SSIM re-scores of new bests
#
#   mkdir -p /tmp/tpu_queue
#   nohup bash tools/tpu_queue_r5f.sh > /tmp/tpu_queue/driver_r5f.log 2>&1 &
#   echo $! > /tmp/tpu_queue/driver_r5f.pid
set -u
cd /root/repo
LOG=/tmp/tpu_queue
mkdir -p "$LOG"
RES=tools/quality/results
W1BEST="$RES/DATwConstantnCv1_shared_s8-8-2_distill1.0T8-16-8_24k.best.ckpt"
TEACHER="configs/teachers/DATwConstantnCv1_shared_s8-16-8.best.ckpt"
DEADLINE=$(date -d "2026-08-20 11:00" +%s)

stamp() { date "+%H:%M:%S"; }
say() { echo "[$(stamp)] $*"; }
left() { echo $(( DEADLINE - $(date +%s) )); }
has_final() { [ -f "$1" ] && grep -q '"event": "final"' "$1"; }
has_stop() { [ -f "$1" ] && grep -qE '"event": "(final|stop)"' "$1"; }
has_eval() { [ -f "$1" ] && grep -q '"event": "eval"' "$1"; }

say "queue r5f starting ($(left)s to deadline)"

# 1. Finish the exact-best regen (resume keeps the watermark). At 11.5k
#    after the r5a+r5e sessions; 4000 steps x 0.54 + startup ~ 2.9 ks.
RJ="$RES/DATwConstantnCv1_24k_regenbest.jsonl"
if ! has_stop "$RJ" && [ "$(left)" -ge 3600 ]; then
  B=$(( $(left) - 120 )); [ "$B" -gt 4500 ] && B=4500
  say "stage regen_finish: START (budget ${B}s)"
  timeout "$B" python tools/quality/head_to_head.py \
    --model DATwConstantnCv1 --steps 24000 --stop_at 15500 \
    --tag_suffix _regenbest --resume \
    > "$LOG/exact_regen3.log" 2>&1
  say "stage regen_finish: rc=$? (tail: $(tail -1 "$LOG/exact_regen3.log" 2>/dev/null | cut -c1-160))"
else say "stage regen_finish: skip (done or no time)"; fi
# Guarded restore: only replace the committed best if the regen curve
# reproduces the quoted 38.18 @ 15500 within noise.
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

# 2. Second-seed distilled w=1.0 arm, FULL 24k (~2.6 ks). The existing
#    jsonl holds only a dead "start" line from the killed r5a — clear it
#    so the curve is one clean run.
J="$RES/DATwConstantnCv1_shared_s8-8-2_distill1.0T8-16-8_seed123_24k.jsonl"
if ! has_eval "$J"; then rm -f "$J"; fi
if ! has_final "$J" && [ "$(left)" -ge 3300 ]; then
  B=$(( $(left) - 120 )); [ "$B" -gt 4200 ] && B=4200
  say "stage s123_w1: START (budget ${B}s)"
  timeout "$B" python tools/quality/head_to_head.py \
    --model DATwConstantnCv1 --shared --samples 8,8,2 --steps 24000 \
    --seed 123 --distill_from "$TEACHER" \
    --teacher_shared --teacher_samples 8,16,8 --distill_w 1.0 --resume \
    > "$LOG/s123_w1.log" 2>&1
  say "stage s123_w1: rc=$? (tail: $(tail -1 "$LOG/s123_w1.log" 2>/dev/null | cut -c1-160))"
else say "stage s123_w1: skip"; fi

# 3. Second-seed exact-parity arm, --stop_at 10000 on the 24k schedule
#    (matched-truncation comparison vs best-through-10k of stage 2's
#    curve). 10k x 0.54 + startup ~ 6.3 ks; a deadline-truncated partial
#    is still usable at its last eval. Reserve 3.0 ks for stages 4+.
J="$RES/DATwConstantnCv1_seed123_24k.jsonl"
if grep -q "placeholder" "$J" 2>/dev/null; then rm -f "$J"; fi
B=$(( $(left) - 3000 )); [ "$B" -gt 7200 ] && B=7200
if ! has_stop "$J" && [ "$B" -ge 3600 ]; then
  say "stage s123_exact_10k: START (budget ${B}s)"
  timeout "$B" python tools/quality/head_to_head.py \
    --model DATwConstantnCv1 --steps 24000 --stop_at 10000 \
    --seed 123 --resume \
    > "$LOG/exact_s123.log" 2>&1
  say "stage s123_exact_10k: rc=$? (tail: $(tail -1 "$LOG/exact_s123.log" 2>/dev/null | cut -c1-160))"
else say "stage s123_exact_10k: skip (done or budget ${B}s < 3600)"; fi

# 4. Multi-instant arm: distilled w=1.0 with the training-pool t drawn
#    uniformly from [0.125, 0.875] (covers the factor-8 serving grid);
#    held-out eval stays t=0.5 for cross-arm comparability. ~2.7 ks.
J="$RES/DATwConstantnCv1_shared_s8-8-2_distill1.0T8-16-8_rt125-875_24k.jsonl"
if ! has_final "$J" && [ "$(left)" -ge 3300 ]; then
  B=$(( $(left) - 120 )); [ "$B" -gt 4200 ] && B=4200
  say "stage rt_arm: START (budget ${B}s)"
  timeout "$B" python tools/quality/head_to_head.py \
    --model DATwConstantnCv1 --shared --samples 8,8,2 --steps 24000 \
    --random_t 0.125,0.875 --distill_from "$TEACHER" \
    --teacher_shared --teacher_samples 8,16,8 --distill_w 1.0 --resume \
    > "$LOG/rt_arm.log" 2>&1
  say "stage rt_arm: rc=$? (tail: $(tail -1 "$LOG/rt_arm.log" 2>/dev/null | cut -c1-160))"
else say "stage rt_arm: skip"; fi

# 5. IFRNet batch ladder + attribution (VERDICT #5). ~5 compiles.
if [ ! -f "$LOG/ifrnet_sweep.json" ] && [ "$(left)" -ge 2100 ]; then
  B=$(( $(left) - 120 )); [ "$B" -gt 4500 ] && B=4500
  say "stage ifrnet_sweep: START (budget ${B}s)"
  timeout "$B" python tools/perf/ifrnet_batch_sweep.py \
    > "$LOG/ifrnet_sweep.log" 2>&1
  rc=$?
  grep -h '^{' "$LOG/ifrnet_sweep.log" > "$LOG/ifrnet_sweep.json" || true
  say "stage ifrnet_sweep: rc=$rc (tail: $(tail -1 "$LOG/ifrnet_sweep.log" 2>/dev/null | cut -c1-160))"
else say "stage ifrnet_sweep: skip"; fi

# 6. Per-instant PSNR/SSIM: the rt arm's best vs the shipped (t=0.5
#    trained) w=1.0 best — quantifies the t-extrapolation penalty.
RTBEST="$RES/DATwConstantnCv1_shared_s8-8-2_distill1.0T8-16-8_rt125-875_24k.best.ckpt"
G2=()
[ -f "$W1BEST" ] && G2+=("$W1BEST")
[ -f "$RTBEST" ] && G2+=("$RTBEST")
if [ "${#G2[@]}" -gt 0 ] && [ "$(left)" -ge 2100 ] \
   && ! grep -q "rt125-875" "$RES/eval_instants.jsonl" 2>/dev/null; then
  B=$(( $(left) - 120 )); [ "$B" -gt 3600 ] && B=3600
  say "stage instants (${#G2[@]} ckpts): START (budget ${B}s)"
  timeout "$B" python tools/quality/eval_instants.py \
    --ckpt "${G2[@]}" --shared --samples 8,8,2 \
    > "$LOG/instants.log" 2>&1
  say "stage instants: rc=$? (tail: $(tail -1 "$LOG/instants.log" 2>/dev/null | cut -c1-200))"
else say "stage instants: skip"; fi

# 7. Progressive distillation: teacher = the w=1.0 student (VERDICT #7).
J="$RES/DATwConstantnCv1_shared_s8-8-2_distill1.0T8-8-2_24k.jsonl"
if [ -f "$W1BEST" ] && ! has_final "$J" && [ "$(left)" -ge 3000 ]; then
  B=$(( $(left) - 120 )); [ "$B" -gt 4200 ] && B=4200
  say "stage progressive_24k: START (budget ${B}s)"
  timeout "$B" python tools/quality/head_to_head.py \
    --model DATwConstantnCv1 --shared --samples 8,8,2 --steps 24000 \
    --distill_from "$W1BEST" --teacher_shared --teacher_samples 8,8,2 \
    --distill_w 1.0 --resume \
    > "$LOG/progressive_24k.log" 2>&1
  say "stage progressive_24k: rc=$? (tail: $(tail -1 "$LOG/progressive_24k.log" 2>/dev/null | cut -c1-160))"
else say "stage progressive_24k: skip"; fi

# 8. Wide-student latency ladder (VERDICT #6 pricing).
if [ ! -f "$LOG/wide_latency.json" ] && [ "$(left)" -ge 1800 ]; then
  B=$(( $(left) - 120 )); [ "$B" -gt 3600 ] && B=3600
  say "stage wide_latency: START (budget ${B}s)"
  timeout "$B" python tools/perf/wide_student_bench.py \
    > "$LOG/wide_latency.log" 2>&1
  rc=$?
  grep -h '^{' "$LOG/wide_latency.log" > "$LOG/wide_latency.json" || true
  say "stage wide_latency: rc=$rc (tail: $(tail -1 "$LOG/wide_latency.log" 2>/dev/null | cut -c1-160))"
else say "stage wide_latency: skip"; fi

# 9. Re-scores of any new bests this queue produced (one compile each
#    seed group; leftover-time stage).
G42=()
for f in \
  "$RES/DATwConstantnCv1_shared_s8-8-2_distill1.5T8-16-8_24k.best.ckpt" \
  "$RES/DATwConstantnCv1_shared_s8-8-2_distill2.0T8-16-8_24k.best.ckpt" \
  "$RES/DATwConstantnCv1_shared_s8-8-2_distill1.0T8-8-2_24k.best.ckpt"; do
  [ -f "$f" ] && G42+=("$f")
done
if [ "${#G42[@]}" -gt 0 ] && [ "$(left)" -ge 1500 ]; then
  B=$(( $(left) - 120 )); [ "$B" -gt 2700 ] && B=2700
  say "stage eval_r5_seed42 (${#G42[@]} ckpts): START (budget ${B}s)"
  timeout "$B" python tools/quality/eval_best.py \
    --ckpt "${G42[@]}" --shared --samples 8,8,2 \
    > "$LOG/eval_r5_42.log" 2>&1
  say "stage eval_r5_seed42: rc=$? (tail: $(tail -1 "$LOG/eval_r5_42.log" 2>/dev/null | cut -c1-200))"
else say "stage eval_r5_seed42: skip"; fi
S123BEST="$RES/DATwConstantnCv1_shared_s8-8-2_distill1.0T8-16-8_seed123_24k.best.ckpt"
if [ -f "$S123BEST" ] && [ "$(left)" -ge 1500 ]; then
  B=$(( $(left) - 120 )); [ "$B" -gt 2400 ] && B=2400
  say "stage eval_r5_seed123: START (budget ${B}s)"
  timeout "$B" python tools/quality/eval_best.py \
    --ckpt "$S123BEST" --shared --samples 8,8,2 --seed 123 \
    > "$LOG/eval_r5_123.log" 2>&1
  say "stage eval_r5_seed123: rc=$? (tail: $(tail -1 "$LOG/eval_r5_123.log" 2>/dev/null | cut -c1-200))"
else say "stage eval_r5_seed123: skip"; fi

say "queue r5f complete ($(left)s to deadline)"
