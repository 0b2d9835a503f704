#!/bin/bash
# Round-4 queue #2: costate-kernel numerical parity, bench revalidation on
# an idle box, f32 forward-kernel crossover (b256/b512), quadrotor probe
# with the round-4 model fix + tuned mixed knobs. Waits for relay revival;
# each step individually time-bounded so later steps still run. Timeouts
# are generous — killing a worker mid-dispatch wedges the relay for
# 20 min - 3.5 h (measured), so a step must almost always finish or exit
# by its own budget first.
LOG=${LOG:-/tmp/round4b_queue.log}
cd "$(dirname "$0")/.."

log() { echo "=== $(date +%H:%M:%S) $*" >> "$LOG"; }

log "queue 4b started; waiting for relay"
for i in $(seq 1 500); do
  if timeout 90 python -c "
import jax, jax.numpy as jnp, numpy as np
np.asarray(jnp.ones((64,64)) @ jnp.ones((64,64)))
print('healthy')" 2>/dev/null | grep -q healthy; then
    log "RELAY HEALTHY after $i probes"
    break
  fi
  if [ "$i" = 500 ]; then log "relay never recovered"; exit 1; fi
  sleep 60
done

log "1/4 costate kernel on-chip parity (f32 + df64)"
timeout 2400 python scripts/tpu_costate_parity.py >> "$LOG" 2>&1
log "parity rc=$?"

log "2/4 full bench (idle box)"
timeout 1700 python bench.py >> "$LOG" 2>&1
log "bench rc=$?"

log "3/4 forward kernel crossover b256 / b512"
for B in 256 512; do
  PROBE_BATCH=$B PROBE_DTYPES=f32 PROBE_MODES=pallas,xla PROBE_ITERS=30 \
    timeout 1500 python scripts/tpu_forward_probe.py >> "$LOG" 2>&1
  log "forward b$B rc=$?"
done

log "4/4 quadrotor probe b1024 (fixed model + tuned phase-1 knobs)"
timeout 1800 python scripts/tpu_quadrotor_probe.py >> "$LOG" 2>&1
log "quadrotor rc=$?"
log "queue 4b done"
