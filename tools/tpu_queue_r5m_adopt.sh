#!/bin/bash
# Adopt the orphaned s123_exact_6k python (its r5l driver was killed
# before its 4600 s stage budget could cut the run short at ~step 5100),
# stall-kill it by PID if its log goes quiet 600 s, then chain into the
# r5m queue (whose stage-2 done-check/--resume picks up either way).
set -u
PID="${1:?pid}"
LF="${2:-/tmp/tpu_queue/s123_exact_6k.log}"
STALL_S=600
while [ -d "/proc/$PID" ]; do
  sleep 20
  NOW=$(date +%s)
  MT=$(stat -c %Y "$LF" 2>/dev/null || echo "$NOW")
  if [ $(( NOW - MT )) -ge "$STALL_S" ]; then
    echo "[adopt] $PID quiet ${STALL_S}s, killing"
    kill "$PID" 2>/dev/null; sleep 5; kill -9 "$PID" 2>/dev/null
    break
  fi
done
echo "[adopt] child drained; starting r5m"
exec bash tools/tpu_queue_r5m.sh
