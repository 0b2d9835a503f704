"""Find the largest working batch size for the f64 solve on this chip."""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))
import jax
jax.config.update("jax_enable_x64", True)
cache = os.path.join(os.path.dirname(__file__), os.pardir, ".jax_cache")
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np
from ipddp2tpu import Options
from ipddp2tpu.batch import solve_batch
from ipddp2tpu.models import concar

problem = concar.problem()
u0 = concar.initial_controls()

def make_batch(batch, seed):
    keys = jax.random.split(jax.random.PRNGKey(seed), batch)
    thetas, f_lims, tau_lims, x1s = jax.vmap(concar.random_instance)(keys)
    return (concar.bounds(f_lims, tau_lims), x1s,
            jnp.broadcast_to(u0, (batch, concar.T, concar.NU)), thetas)

def bench_cfg(iters, batch, unroll):
    options = Options(optimality_tolerance=1e-7, ldlt_unroll=unroll,
                      max_iterations=iters)
    fn = jax.jit(lambda b, x, u, th: solve_batch(
        problem, b, x, u, theta=th, options=options))
    try:
        a1 = make_batch(batch, 0)
        t0 = time.time()
        sol = fn(*a1); np.asarray(sol.converged)
        c = time.time() - t0
        a2 = make_batch(batch, 1)
        t0 = time.time()
        sol = fn(*a2); np.asarray(sol.converged)
        r = time.time() - t0
        print(f"[iters={iters} batch={batch} unroll={unroll}] "
              f"c+r={c:.1f}s run={r:.2f}s per_inst_iter="
              f"{r/iters/batch*1000:.2f}ms", flush=True)
        return True
    except Exception as e:
        print(f"[iters={iters} batch={batch} unroll={unroll}] FAILED: "
              f"{type(e).__name__}: {str(e)[:120]}", flush=True)
        return False

for batch in [16, 32, 64]:
    okb = bench_cfg(30, batch, False)
    if not okb:
        break
