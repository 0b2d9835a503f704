"""Pool vs lockstep on the chip: does continuous batching beat
lockstep-with-freezing for the f32 bulk phase?

Lockstep chunked batches already freeze converged instances via per-instance
k_limits, and frozen instances make late batch-iterations cheap — so the
pool's theoretical occupancy win must beat its extra host round-trips
(harvest/refill are per-slot dispatches at ~50 ms each over the relay).

Env: PROBE_N (512), PROBE_SLOTS (256), PROBE_CHUNK (40), PROBE_TOL (3e-4).
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
from ipddp2tpu.serve import solve_pool, solve_pool_resident

N = int(os.environ.get("PROBE_N", "512"))
SLOTS = int(os.environ.get("PROBE_SLOTS", "256"))
CHUNK = int(os.environ.get("PROBE_CHUNK", "40"))
TOL = float(os.environ.get("PROBE_TOL", "3e-4"))

problem = concar.problem()
options = Options(optimality_tolerance=TOL, max_iterations=600,
                  ldlt_unroll=False)


def make(seed, n):
    keys = jax.random.split(jax.random.PRNGKey(seed), n)
    thetas, f_lims, tau_lims, x1s = jax.vmap(concar.random_instance)(keys)
    u0 = jnp.broadcast_to(concar.initial_controls(),
                          (n, concar.T, concar.NU))
    args = (concar.bounds(f_lims, tau_lims), x1s, u0, thetas)
    cast = lambda a: (a.astype(jnp.float32)
                      if jnp.issubdtype(a.dtype, jnp.floating) else a)
    return jax.tree.map(cast, args)


for seed in (1, 0):                       # seed 1 = warm/compile
    label = "warm" if seed == 1 else "measured"

    b, x, u, th = make(seed, N)
    t0 = time.time()
    sol = solve_chunked(problem, b, x, u, theta=th, options=options,
                        chunk=CHUNK, batched=True)
    conv = np.asarray(sol.converged)
    w_lock = time.time() - t0
    print(f"{label} lockstep b{N}: {int(conv.sum())}/{N} in {w_lock:.1f}s "
          f"-> {conv.sum() / w_lock:.2f} OCPs(f32)/s", flush=True)

    if os.environ.get("PROBE_HOST_POOL"):
        b, x, u, th = make(seed, N)
        t0 = time.time()
        res = solve_pool(problem, b, x, u, theta=th, options=options,
                         slots=SLOTS, chunk=CHUNK)
        conv = np.asarray(res.solutions.converged)
        w_pool = time.time() - t0
        print(f"{label} pool {SLOTS} slots: {int(conv.sum())}/{N} in "
              f"{w_pool:.1f}s -> {conv.sum() / w_pool:.2f} OCPs(f32)/s "
              f"(occupancy {res.occupancy:.2f}, {res.chunks} chunks)",
              flush=True)

    b, x, u, th = make(seed, N)
    t0 = time.time()
    res = solve_pool_resident(problem, b, x, u, theta=th, options=options,
                              slots=SLOTS, chunk=CHUNK)
    conv = np.asarray(res.solutions.converged)
    w_pool = time.time() - t0
    print(f"{label} resident pool {SLOTS} slots: {int(conv.sum())}/{N} in "
          f"{w_pool:.1f}s -> {conv.sum() / w_pool:.2f} OCPs(f32)/s "
          f"(occupancy {res.occupancy:.2f}, {res.chunks} chunks)",
          flush=True)
