#!/bin/bash
# Round-4 TPU queue, revision C (ONE TPU process at a time — CLAUDE.md).
#
# Runs AFTER tpu_queue_r4b.sh exits (waits on its pid): resumes the
# exact-parity arm under the ROUND-4 protocol (HBM-resident pool
# sampler) so the headline "distilled DAT_fast (38.55) vs exact parity"
# comparison is in-protocol, not cross-protocol (BENCH_NOTES round-4
# protocol note). The arm already has a step-2000 resume checkpoint
# (tools/quality/results/DATwConstantnCv1_24k.ckpt) at ~0.58 s/step;
# the 10800 s timeout reaches ~step 18-20k, past exact's round-3 best
# step (12k). Resume-capable: rerun this script to continue further.
#
#   nohup bash tools/tpu_queue_r4c.sh > /tmp/tpu_queue/driver_c.log 2>&1 &
set -u
cd /root/repo
LOG=/tmp/tpu_queue
mkdir -p "$LOG"
RES=tools/quality/results

stamp() { date "+%H:%M:%S"; }
say() { echo "[$(stamp)] $*"; }
has_final() { [ -f "$1" ] && grep -q '"event": "final"' "$1"; }

# wait for the r4b driver (and its bench stage) to release the TPU
if [ -f "$LOG/driver_b.pid" ]; then
  BPID=$(cat "$LOG/driver_b.pid")
  while kill -0 "$BPID" 2>/dev/null; do sleep 30; done
fi
say "r4b released the TPU"

OUT="$RES/DATwConstantnCv1_24k.jsonl"
if ! has_final "$OUT"; then
  say "stage exact_24k_resume: START"
  timeout 10800 python tools/quality/head_to_head.py \
    --model DATwConstantnCv1 --steps 24000 --resume \
    > "$LOG/exact_24k_resume.log" 2>&1
  say "stage exact_24k_resume: rc=$? (tail: $(tail -1 "$LOG/exact_24k_resume.log" 2>/dev/null | cut -c1-160))"
else say "stage exact_24k_resume: skip (final)"; fi

say "queue r4c complete"
