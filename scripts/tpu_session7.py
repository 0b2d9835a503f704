"""Pool driver on hardware: f64 pool vs plain chunked batch."""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))
import jax
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_default_matmul_precision", "highest")
cache = os.path.join(os.path.dirname(__file__), os.pardir, ".jax_cache")
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np
from ipddp2tpu import Options
from ipddp2tpu.serve import solve_pool
from ipddp2tpu.models import concar

problem = concar.problem()
options = Options(optimality_tolerance=1e-7, max_iterations=600,
                  ldlt_unroll=False)

def make(n, seed):
    keys = jax.random.split(jax.random.PRNGKey(seed), n)
    thetas, f_lims, tau_lims, x1s = jax.vmap(concar.random_instance)(keys)
    u0 = jnp.broadcast_to(concar.initial_controls(),
                          (n, concar.T, concar.NU))
    return concar.bounds(f_lims, tau_lims), x1s, u0, thetas

n, slots = 32, 8
a1 = make(n, 1)
t0 = time.time()
res = solve_pool(problem, *a1[:3], theta=a1[3], options=options,
                 slots=slots, chunk=20)
c = time.time() - t0
a2 = make(n, 0)
t0 = time.time()
res = solve_pool(problem, *a2[:3], theta=a2[3], options=options,
                 slots=slots, chunk=20)
r = time.time() - t0
conv = int(res.solutions.converged.sum())
print(f"[pool f64 n={n} slots={slots}] c+r={c:.0f}s run={r:.1f}s "
      f"conv={conv}/{n} ocps={conv/r:.3f} occupancy={res.occupancy:.2f}",
      flush=True)
