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

iters = int(sys.argv[1]) if len(sys.argv) > 1 else 3
batch = int(sys.argv[2]) if len(sys.argv) > 2 else 0
spec = int(sys.argv[3]) if len(sys.argv) > 3 else 0
options = Options(optimality_tolerance=1e-7, ldlt_unroll=False,
                  max_iterations=iters, ls_speculative=spec)
problem = concar.problem()
theta, f_lim, tau_lim, x1 = concar.seed1_instance()
bounds = concar.bounds(f_lim, tau_lim)
u0 = concar.initial_controls()

if batch == 0:
    fn = jax.jit(lambda b, x, u, th: solve(problem, b, x, u, theta=th,
                                           options=options))
    args = (bounds, x1, u0, theta)
else:
    from ipddp2tpu.batch import solve_batch
    keys = jax.random.split(jax.random.PRNGKey(0), batch)
    thetas, f_lims, tau_lims, x1s = jax.vmap(concar.random_instance)(keys)
    bounds_b = concar.bounds(f_lims, tau_lims)
    u0b = jnp.broadcast_to(u0, (batch, concar.T, concar.NU))
    fn = jax.jit(lambda b, x, u, th: solve_batch(problem, b, x, u, theta=th,
                                                 options=options))
    args = (bounds_b, x1s, u0b, thetas)

t0 = time.time()
sol = fn(*args); jax.block_until_ready(sol.converged)
print(f"iters={iters} batch={batch} spec={spec} compile+run:",
      round(time.time() - t0, 2), flush=True)
# time with FRESH inputs (the relay memoizes identical executions)
if batch == 0:
    args2 = (bounds, x1 + 1e-3, u0, theta)
else:
    keys = jax.random.split(jax.random.PRNGKey(1), batch)
    thetas2, f2, t2, x2 = jax.vmap(concar.random_instance)(keys)
    args2 = (concar.bounds(f2, t2), x2,
             jnp.broadcast_to(u0, (batch, concar.T, concar.NU)), thetas2)
t0 = time.time()
sol = fn(*args2); jax.block_until_ready(sol.converged)
dt = time.time() - t0
print("run:", round(dt, 3), "s; per-iter:", round(dt / max(iters,1), 4),
      "k:", int(jnp.max(sol.iterations)), flush=True)
