#!/bin/bash
# Poll TPU health; when healthy, run the given command.
for i in $(seq 1 50); do
  if timeout 90 python -c "
import jax, jax.numpy as jnp, numpy as np
np.asarray(jnp.ones((64,64)) @ jnp.ones((64,64)))
print('healthy')" 2>/dev/null | grep -q healthy; then
    echo "TPU healthy after $i probes; running: $@"
    exec "$@"
  fi
  sleep 45
done
echo "TPU never recovered"
