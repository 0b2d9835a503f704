#!/bin/bash
# Round-4 queue #5 (chained after 4d): the last two cheap knob probes.
#   A. K=2 phase-1 hybrid LS — K=4 already won over K=8; does halving
#      again keep winning, or does the sequential continuation start
#      firing often enough to give the gain back?
#   B. K=4 phase-2 (f64 endgame) speculative lanes — the endgame rollout
#      work is compute-bound and linear in K; 16 lost to 8 in round 2,
#      4 was never measured.
# Both must be DONE and the box idle well before the driver's own bench.
LOG=${LOG:-/tmp/round4e_queue.log}
cd "$(dirname "$0")/.."

log() { echo "=== $(date +%H:%M:%S) $*" >> "$LOG"; }

log "queue 4e started; waiting for queue 4d"
for i in $(seq 1 500); do
  grep -q "queue 4d done" /tmp/round4d_queue.log 2>/dev/null && break
  if [ "$i" = 500 ]; then log "4d never finished"; exit 1; fi
  sleep 60
done

log "A: bench BENCH_P1SPEC=2"
BENCH_P1SPEC=2 timeout 1700 python bench.py >> "$LOG" 2>&1
log "bench K=2 rc=$?"

log "B: bench BENCH_P2SPEC=4 (phase-1 at the new K=4 default)"
BENCH_P2SPEC=4 timeout 1700 python bench.py >> "$LOG" 2>&1
log "bench P2SPEC=4 rc=$?"
log "queue 4e done"
