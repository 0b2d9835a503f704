"""One long TPU session: all measurements sequentially under a single claim."""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))
import jax
jax.config.update("jax_enable_x64", True)
cache = os.path.join(os.path.dirname(__file__), os.pardir, ".jax_cache")
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
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

def bench_cfg(iters, batch, spec):
    options = Options(optimality_tolerance=1e-7, ldlt_unroll=False,
                      max_iterations=iters, ls_speculative=spec)
    fn = jax.jit(lambda b, x, u, th: solve_batch(
        problem, b, x, u, theta=th, options=options))
    import numpy as np
    a1 = make_batch(batch, 0)
    t0 = time.time()
    sol = fn(*a1); np.asarray(sol.converged)   # host read forces completion
    c = time.time() - t0
    a2 = make_batch(batch, 1)
    t0 = time.time()
    sol = fn(*a2); np.asarray(sol.converged)
    r = time.time() - t0
    kmax = int(jnp.max(sol.iterations))
    conv = int(jnp.sum(sol.converged))
    print(f"[iters={iters} batch={batch} spec={spec}] compile+run={c:.1f}s "
          f"run={r:.2f}s per_iter={r/max(kmax,1)*1000:.1f}ms kmax={kmax} "
          f"conv={conv}/{batch}", flush=True)
    return r, kmax, conv

bench_cfg(30, 8, 0)
bench_cfg(30, 64, 0)
bench_cfg(30, 256, 0)
bench_cfg(600, 256, 0)
