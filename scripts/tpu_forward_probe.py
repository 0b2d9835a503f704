"""Measure the fused Pallas FORWARD megakernel on the real chip.

Times N-iteration chunked solves of batched concar with the forward
speculative-LS kernel on/off, in f32 and f64, at a given batch — the
round-3 lever: docs/PERF.md round-2 attribution showed the forward pass
(48.9 ms full line search) dominating the f64-endgame iteration after the
backward megakernel (12 ms).

Env: PROBE_BATCH (64), PROBE_ITERS (30), PROBE_DTYPES (f32,f64),
PROBE_MODES (pallas,xla — forward_kernel values), PROBE_K (8).
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
DTYPES = os.environ.get("PROBE_DTYPES", "f32,f64").split(",")
MODES = os.environ.get("PROBE_MODES", "pallas,xla").split(",")
K = int(os.environ.get("PROBE_K", "8"))

problem = concar.problem()


def make(seed, dtype):
    keys = jax.random.split(jax.random.PRNGKey(seed), BATCH)
    thetas, f_lims, tau_lims, x1s = jax.vmap(concar.random_instance)(keys)
    u0 = jnp.broadcast_to(concar.initial_controls(),
                          (BATCH, concar.T, concar.NU))
    args = (concar.bounds(f_lims, tau_lims), x1s, u0, thetas)
    cast = lambda a: (a.astype(dtype)
                     if jnp.issubdtype(a.dtype, jnp.floating) else a)
    return jax.tree.map(cast, args)


for dt_name in DTYPES:
    dtype = jnp.float32 if dt_name == "f32" else jnp.float64
    for mode in MODES:
        # PROBE_HYBRID=1: the bench-real hybrid line search (speculative
        # K-lane eval + sequential continuation). Pure spec (default) with
        # small K fails whole batches at iteration 0 (status 7) — a K=4
        # b2048 probe without it measures nothing.
        options = Options(optimality_tolerance=1e-10, max_iterations=ITERS,
                          ldlt_unroll=False, forward_kernel=mode,
                          ls_speculative=K, auto_tune=False,
                          ls_spec_continue=bool(
                              os.environ.get("PROBE_HYBRID")))
        t0 = time.time()
        b, x, u, th = make(1, dtype)
        sol = solve_chunked(problem, b, x, u, theta=th, options=options,
                            chunk=ITERS, batched=True)
        np.asarray(sol.iterations)
        compile_s = time.time() - t0

        b, x, u, th = make(2, dtype)
        t0 = time.time()
        sol = solve_chunked(problem, b, x, u, theta=th, options=options,
                            chunk=ITERS, batched=True)
        iters = np.asarray(sol.iterations)
        wall = time.time() - t0
        total_iters = int(iters.max())
        print(f"fwd={mode} {dt_name} K={K}: b={BATCH} {wall:.2f}s for "
              f"{total_iters} batch-iters -> "
              f"{1e3 * wall / max(total_iters, 1):.1f} ms/iter "
              f"(compile+1st {compile_s:.1f}s)", flush=True)
