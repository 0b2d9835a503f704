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

options = Options(optimality_tolerance=1e-7, ldlt_unroll=False,
                  max_iterations=3)
problem = concar.problem()
theta, f_lim, tau_lim, x1 = concar.seed1_instance()
bounds = concar.bounds(f_lim, tau_lim)
u0 = concar.initial_controls()
fn = jax.jit(lambda b, x, u, th: solve(problem, b, x, u, theta=th,
                                       options=options))
t0 = time.time()
sol = fn(bounds, x1, u0, theta)
jax.block_until_ready(sol)
print("call1:", round(time.time() - t0, 2), "k=", int(sol.iterations),
      "status=", int(sol.status), "obj=", float(sol.objective),
      "du=", float(sol.dual_inf), "pr=", float(sol.primal_inf), flush=True)
t0 = time.time()
sol = fn(bounds, x1, u0, theta)
jax.block_until_ready(sol)
print("call2:", round(time.time() - t0, 3), flush=True)
