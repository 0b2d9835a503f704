#!/bin/bash
# Round-4 queue #3 (chained after queue 4b): bench A/B experiments.
#   A. hybrid-LS K=4 in the f32 phase — spec-8's batched forward eval is
#      ~28 ms of the ~75 ms f32 iteration at b1024; K=4 halves the
#      candidate work while the sequential continuation keeps semantics.
#   B. f32-forward-kernel ablation — same bench with the batch-aware f32
#      Pallas dispatch disabled (env threshold pushed out of reach), to
#      separate the kernel's contribution from relay noise vs 4b's bench.
# Each run streams best-so-far JSON on SIGTERM, so the timeout always
# leaves a result line in the log.
LOG=${LOG:-/tmp/round4c_queue.log}
cd "$(dirname "$0")/.."

log() { echo "=== $(date +%H:%M:%S) $*" >> "$LOG"; }

log "queue 4c started; waiting for queue 4b to finish"
for i in $(seq 1 500); do
  grep -q "queue 4b done" /tmp/round4b_queue.log 2>/dev/null && break
  if [ "$i" = 500 ]; then log "4b never finished"; exit 1; fi
  sleep 60
done
log "4b done; starting A/B benches"

log "A: bench with BENCH_P1SPEC=4 (hybrid-LS K=4 f32 phase)"
BENCH_P1SPEC=4 timeout 1700 python bench.py >> "$LOG" 2>&1
log "bench K=4 rc=$?"

log "B: bench with f32 forward kernel ablated (threshold out of reach)"
IPDDP2TPU_F32_FWD_MIN_BATCH=999999 timeout 1700 python bench.py >> "$LOG" 2>&1
log "bench f32-kernel-off rc=$?"
log "queue 4c done"
