#!/bin/bash
# Round-4 queue #4 (chained after 4c): the disambiguation run.
# 4c-A measured (K=4, f32-kernel-on) = 26.9/27.9; 4c-B measures the
# default (K=8, kernel-off). This run measures (K=4, kernel-off) — with
# the round-4 default threshold the env override is a no-op kept for
# explicitness — so the K effect separates from the kernel effect. If
# K=4 wins standalone, autotune's large-batch f32 row flips to 4 and this
# run's programs are already the warmed cache entries for that default.
LOG=${LOG:-/tmp/round4d_queue.log}
cd "$(dirname "$0")/.."

log() { echo "=== $(date +%H:%M:%S) $*" >> "$LOG"; }

log "queue 4d started; waiting for queue 4c"
for i in $(seq 1 500); do
  grep -q "queue 4c done" /tmp/round4c_queue.log 2>/dev/null && break
  if [ "$i" = 500 ]; then log "4c never finished"; exit 1; fi
  sleep 60
done

log "bench with BENCH_P1SPEC=4, f32 kernel off (default threshold)"
BENCH_P1SPEC=4 IPDDP2TPU_F32_FWD_MIN_BATCH=999999 \
  timeout 1700 python bench.py >> "$LOG" 2>&1
log "bench K=4 kernel-off rc=$?"
log "queue 4d done"
