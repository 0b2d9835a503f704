#!/bin/bash
# Round-4 TPU validation queue: waits for the relay to revive, then runs
# the whole on-chip checklist unattended, appending to $LOG. Exploits a
# revival window of any length — each step is individually time-bounded
# and later steps still run if an earlier one fails.
LOG=${LOG:-/tmp/round4_queue.log}
cd "$(dirname "$0")/.."

log() { echo "=== $(date +%H:%M:%S) $*" >> "$LOG"; }

log "queue started; waiting for relay"
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

log "1/5 sharded+pallas smoke (validates costate kernel Mosaic lowering)"
timeout 1500 python scripts/tpu_sharded_smoke.py >> "$LOG" 2>&1
log "smoke rc=$?"

log "2/5 f32 phase probe b1024 (costate kernel A/B)"
PROBE_DTYPE=f32 PROBE_BATCH=1024 timeout 1800 \
  python scripts/tpu_f64_phase_probe.py >> "$LOG" 2>&1
log "phase probe rc=$?"

log "3/5 forward kernel probe f32 b1024"
PROBE_BATCH=1024 PROBE_DTYPES=f32 PROBE_MODES=pallas,xla PROBE_ITERS=30 \
  timeout 1800 python scripts/tpu_forward_probe.py >> "$LOG" 2>&1
log "forward probe rc=$?"

log "4/5 full bench"
timeout 1800 python bench.py >> "$LOG" 2>&1
log "bench rc=$?"

log "5/5 quadrotor probe b1024"
timeout 1500 python scripts/tpu_quadrotor_probe.py >> "$LOG" 2>&1
log "quadrotor rc=$?"
log "queue done"
