"""Batch-size scaling of the megakernel iteration, measured honestly.

One process, all configs interleaved, 3 reps each with fresh inputs (the
axon layer memoizes identical runs and single-shot walls on the shared relay
are noisy). Prints per-rep wall and ms/batch-iter.

Env: PROBE_BATCHES="64,128,256", PROBE_ITERS=30, PROBE_REPS=3,
PROBE_KERNEL=pallas|xla|auto.
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

BATCHES = [int(b) for b in
           os.environ.get("PROBE_BATCHES", "64,128,256").split(",")]
ITERS = int(os.environ.get("PROBE_ITERS", "30"))
REPS = int(os.environ.get("PROBE_REPS", "3"))
KERNEL = os.environ.get("PROBE_KERNEL", "pallas")
DTYPE = {"f32": "float32", "f64": "float64"}[
    os.environ.get("PROBE_DTYPE", "f32")]
QN = bool(int(os.environ.get("PROBE_QN", "0")))

problem = concar.problem()
options = Options(optimality_tolerance=1e-10, max_iterations=ITERS,
                  ldlt_unroll=False, backward_kernel=KERNEL,
                  quasi_newton=QN)


def make(seed, batch):
    keys = jax.random.split(jax.random.PRNGKey(seed), batch)
    thetas, f_lims, tau_lims, x1s = jax.vmap(concar.random_instance)(keys)
    u0 = jnp.broadcast_to(concar.initial_controls(),
                          (batch, concar.T, concar.NU))
    args = (concar.bounds(f_lims, tau_lims), x1s, u0, thetas)
    cast = lambda a: (a.astype(getattr(jnp, DTYPE))
                      if jnp.issubdtype(a.dtype, jnp.floating) else a)
    return jax.tree.map(cast, args)


def once(batch, seed):
    b, x, u, th = make(seed, batch)
    t0 = time.time()
    sol = solve_chunked(problem, b, x, u, theta=th, options=options,
                        chunk=ITERS, batched=True)
    np.asarray(sol.iterations)
    return time.time() - t0


# compile everything first
for batch in BATCHES:
    t0 = time.time()
    once(batch, 1)
    print(f"b={batch}: compile+1st {time.time() - t0:.1f}s", flush=True)

for rep in range(REPS):
    for batch in BATCHES:
        w = once(batch, 100 + rep)
        print(f"b={batch} rep{rep}: {w:.2f}s -> {1e3 * w / ITERS:.1f} "
              f"ms/iter ({1e3 * w / ITERS / batch:.2f} ms/inst-iter)",
              flush=True)
