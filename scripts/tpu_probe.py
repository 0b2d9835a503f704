"""Progressive TPU bring-up probe: isolate what compiles/runs on the chip."""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))
import jax
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp

step = sys.argv[1] if len(sys.argv) > 1 else "1"

from ipddp2tpu import Options
from ipddp2tpu.models import concar
from ipddp2tpu.solve import initialize, iteration, solve

options = Options(optimality_tolerance=1e-7, ldlt_unroll=False,
                  max_iterations=600)
problem = concar.problem()
theta, f_lim, tau_lim, x1 = concar.seed1_instance()
bounds = concar.bounds(f_lim, tau_lim)
u0 = concar.initial_controls()

if step == "1":
    # single iteration, single instance
    t0 = time.time()
    s = initialize(problem, theta, bounds, x1, u0, options)
    fn = jax.jit(lambda s: iteration(problem, bounds, s, theta, options))
    s2 = fn(s); jax.block_until_ready(s2.x)
    print("one iteration compile+run:", time.time() - t0, flush=True)
    t0 = time.time()
    for _ in range(10):
        s = fn(s)
    jax.block_until_ready(s.x)
    print("10 iterations:", time.time() - t0, "obj", float(s.objective), flush=True)
elif step == "2":
    # full solve, single instance
    t0 = time.time()
    fn = jax.jit(lambda b, x, u, th: solve(problem, b, x, u, theta=th,
                                           options=options))
    sol = fn(bounds, x1, u0, theta)
    jax.block_until_ready(sol.converged)
    print("full solve compile+run:", time.time() - t0, flush=True)
    t0 = time.time()
    sol = fn(bounds, x1, u0, theta); jax.block_until_ready(sol.converged)
    print("run:", time.time() - t0, "iters", int(sol.iterations),
          "obj", float(sol.objective), "conv", bool(sol.converged), flush=True)
