import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))
import jax
jax.config.update("jax_enable_x64", True)
cache = os.path.join(os.path.dirname(__file__), os.pardir, ".jax_cache")
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
from ipddp2tpu import Options
from ipddp2tpu.models import concar
from ipddp2tpu.solve import solve

problem = concar.problem()
theta, f_lim, tau_lim, x1 = concar.seed1_instance()
bounds = concar.bounds(f_lim, tau_lim)
u0 = concar.initial_controls()

for iters in [3, 10, 30, 100, 300]:
    options = Options(optimality_tolerance=1e-7, ldlt_unroll=False,
                      max_iterations=iters)
    fn = jax.jit(lambda b, x, u, th: solve(problem, b, x, u, theta=th,
                                           options=options))
    t0 = time.time()
    sol = fn(bounds, x1, u0, theta); jax.block_until_ready(sol.converged)
    c = time.time() - t0
    t0 = time.time()
    sol = fn(bounds, x1, u0, theta); jax.block_until_ready(sol.converged)
    r = time.time() - t0
    print(f"iters={iters}: compile+run={c:.1f}s run={r:.3f}s "
          f"k={int(sol.iterations)} status={int(sol.status)} "
          f"conv={bool(sol.converged)} obj={float(sol.objective):.6e}",
          flush=True)
