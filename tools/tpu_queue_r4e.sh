#!/bin/bash
# Round-4 TPU queue, revision E (ONE TPU process at a time — CLAUDE.md).
#
# Chains after tpu_queue_r4d.sh: re-scores every round-4 best checkpoint
# with PSNR+SSIM (eval_best.py) so the quality table covers both of the
# reference's reported metrics. Checkpoints are grouped by architecture
# so each group pays one remote compile.
#
#   nohup bash tools/tpu_queue_r4e.sh > /tmp/tpu_queue/driver_e.log 2>&1 &
#   echo $! > /tmp/tpu_queue/driver_e.pid
set -u
cd /root/repo
LOG=/tmp/tpu_queue
mkdir -p "$LOG"
RES=tools/quality/results

stamp() { date "+%H:%M:%S"; }
say() { echo "[$(stamp)] $*"; }

if [ -f "$LOG/driver_d.pid" ]; then
  DPID=$(cat "$LOG/driver_d.pid")
  while kill -0 "$DPID" 2>/dev/null; do sleep 30; done
fi
say "r4d released the TPU"

# group 1: fast-student architecture (shared offsets, samples 8,8,2)
G1=()
for f in \
  "$RES/DATwConstantnCv1_shared_s8-8-2_distill0.5T8-16-8_20k.best.ckpt" \
  "$RES/DATwConstantnCv1_shared_s8-8-2_distill0.5T8-16-8_24k.best.ckpt" \
  "$RES/DATwConstantnCv1_shared_s8-8-2_distill0.5_20k.best.ckpt" \
  "$RES/DATwConstantnCv1_shared_s8-8-2_20k.best.ckpt" \
  "$RES/DATwConstantnCv1_shared_s8-8-2_24k.best.ckpt"; do
  [ -f "$f" ] && G1+=("$f")
done
if [ "${#G1[@]}" -gt 0 ]; then
  say "stage eval_s8-8-2 (${#G1[@]} ckpts): START"
  timeout 2400 python tools/quality/eval_best.py \
    --ckpt "${G1[@]}" --shared --samples 8,8,2 \
    > "$LOG/eval_s882.log" 2>&1
  say "stage eval_s8-8-2: rc=$? (tail: $(tail -1 "$LOG/eval_s882.log" 2>/dev/null | cut -c1-200))"
fi

# group 2: the [8,16,8] teacher
if [ -f "$RES/DATwConstantnCv1_shared_s8-16-8_20k.best.ckpt" ]; then
  say "stage eval_s8-16-8: START"
  timeout 2400 python tools/quality/eval_best.py \
    --ckpt "$RES/DATwConstantnCv1_shared_s8-16-8_20k.best.ckpt" \
    --shared --samples 8,16,8 \
    > "$LOG/eval_s8168.log" 2>&1
  say "stage eval_s8-16-8: rc=$? (tail: $(tail -1 "$LOG/eval_s8168.log" 2>/dev/null | cut -c1-200))"
fi

# group 3: exact parity
if [ -f "$RES/DATwConstantnCv1_24k.best.ckpt" ]; then
  say "stage eval_exact: START"
  timeout 2400 python tools/quality/eval_best.py \
    --ckpt "$RES/DATwConstantnCv1_24k.best.ckpt" \
    > "$LOG/eval_exact.log" 2>&1
  say "stage eval_exact: rc=$? (tail: $(tail -1 "$LOG/eval_exact.log" 2>/dev/null | cut -c1-200))"
fi

say "queue r4e complete"
