"""Measure the fused Pallas backward megakernel on the real chip.

Times 30-iteration f32 chunked solves of batched concar instances with
backward_kernel in {xla, pallas}; prints per-batch-iteration ms for each.
Round-1 baseline (CLAUDE.md): ~316 ms/iter at b64 f32 with the scan path.
"""
import os
import sys
import time

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
from ipddp2tpu.chunked import solve_chunked
from ipddp2tpu.models import concar

BATCH = int(os.environ.get("PROBE_BATCH", "64"))
ITERS = int(os.environ.get("PROBE_ITERS", "30"))
KERNELS = os.environ.get("PROBE_KERNELS", "pallas,xla").split(",")
QN = bool(int(os.environ.get("PROBE_QN", "0")))    # quasi-Newton ablation:
                                                   # drops the lam.d2f / phi.d2c
                                                   # contractions + sec terms

problem = concar.problem()


def make(seed):
    keys = jax.random.split(jax.random.PRNGKey(seed), BATCH)
    thetas, f_lims, tau_lims, x1s = jax.vmap(concar.random_instance)(keys)
    u0 = jnp.broadcast_to(concar.initial_controls(),
                          (BATCH, concar.T, concar.NU))
    args = (concar.bounds(f_lims, tau_lims), x1s, u0, thetas)
    cast = lambda a: (a.astype(jnp.float32)
                      if jnp.issubdtype(a.dtype, jnp.floating) else a)
    return jax.tree.map(cast, args)


for kern in KERNELS:
    options = Options(optimality_tolerance=1e-10, max_iterations=ITERS,
                      ldlt_unroll=False, backward_kernel=kern,
                      quasi_newton=QN)
    t0 = time.time()
    b, x, u, th = make(1)
    sol = solve_chunked(problem, b, x, u, theta=th, options=options,
                        chunk=ITERS, batched=True)
    np.asarray(sol.iterations)
    compile_s = time.time() - t0

    b, x, u, th = make(2)
    t0 = time.time()
    sol = solve_chunked(problem, b, x, u, theta=th, options=options,
                        chunk=ITERS, batched=True)
    iters = np.asarray(sol.iterations)
    wall = time.time() - t0
    total_iters = int(iters.max())
    print(f"{kern}{' qn' if QN else ''}: b={BATCH} {wall:.2f}s for "
          f"{total_iters} batch-iters -> "
          f"{1e3 * wall / max(total_iters, 1):.1f} ms/iter "
          f"(compile+1st {compile_s:.1f}s)", flush=True)
