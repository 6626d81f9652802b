#!/bin/bash
# Round-4 TPU queue, revision G (ONE TPU process at a time — CLAUDE.md).
# Chains after tpu_queue_r4f.sh: price the direct multi-instant serving
# path (interpolate.py --mode direct) on the real TPU.
#
#   nohup bash tools/tpu_queue_r4g.sh > /tmp/tpu_queue/driver_g.log 2>&1 &
#   echo $! > /tmp/tpu_queue/driver_g.pid
set -u
cd /root/repo
LOG=/tmp/tpu_queue
mkdir -p "$LOG"

stamp() { date "+%H:%M:%S"; }
say() { echo "[$(stamp)] $*"; }

if [ -f "$LOG/driver_f.pid" ]; then
  FPID=$(cat "$LOG/driver_f.pid")
  while kill -0 "$FPID" 2>/dev/null; do sleep 30; done
fi
say "r4f released the TPU"

say "stage multi_t_bench: START"
timeout 2400 python tools/perf/multi_t_bench.py \
  > "$LOG/multi_t_bench.log" 2>&1
say "stage multi_t_bench: rc=$? (tail: $(tail -1 "$LOG/multi_t_bench.log" 2>/dev/null | cut -c1-200))"

say "stage multi_t_bench_720p: START"
timeout 2400 python tools/perf/multi_t_bench.py --size 720x1280 --n_hi 5 \
  > "$LOG/multi_t_bench_720p.log" 2>&1
say "stage multi_t_bench_720p: rc=$? (tail: $(tail -1 "$LOG/multi_t_bench_720p.log" 2>/dev/null | cut -c1-200))"

say "queue r4g complete"
