#!/bin/bash
# Round-4 TPU queue, revision F (ONE TPU process at a time — CLAUDE.md).
#
# Chains after tpu_queue_r4e.sh: refresh BENCH_SUITE.json with the
# HONEST timing methodology (bench.py now chains both frames through
# the marginal loop; the previous numbers let XLA hoist the x1 encoder
# out of the timed region).
#
#   nohup bash tools/tpu_queue_r4f.sh > /tmp/tpu_queue/driver_f.log 2>&1 &
#   echo $! > /tmp/tpu_queue/driver_f.pid
set -u
cd /root/repo
LOG=/tmp/tpu_queue
mkdir -p "$LOG"

stamp() { date "+%H:%M:%S"; }
say() { echo "[$(stamp)] $*"; }

if [ -f "$LOG/driver_e.pid" ]; then
  EPID=$(cat "$LOG/driver_e.pid")
  while kill -0 "$EPID" 2>/dev/null; do sleep 30; done
fi
say "r4e released the TPU"

say "stage bench_honest: START"
BENCH_BUDGET_S=4200 timeout 5400 python bench.py \
  > "$LOG/bench_honest.log" 2>&1
say "stage bench_honest: rc=$? (tail: $(tail -1 "$LOG/bench_honest.log" 2>/dev/null | cut -c1-200))"

say "queue r4f complete"
