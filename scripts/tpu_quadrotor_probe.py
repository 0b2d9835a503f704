"""Batched-quadrotor throughput probe on the real chip.

BASELINE.json names "Batched concar/quadrotor: 1k-10k vmapped instances"
as a target config; concar is the bench headline, this script measures the
quadrotor counterpart (nx=12, nu=4, nc=0 — stage GEMMs dominate instead of
the KKT factorization). Mixed-precision chunked solve, same machinery as
bench.py's worker.

Env: PROBE_BATCH (1024), PROBE_TOL (1e-7), PROBE_CHUNK (40),
PROBE_MODE (mixed|f64).
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
from ipddp2tpu.batch import batch_stats
from ipddp2tpu.chunked import solve_chunked
from ipddp2tpu.mixed import solve_mixed_chunked
from ipddp2tpu.models import quadrotor as m

BATCH = int(os.environ.get("PROBE_BATCH", "1024"))
TOL = float(os.environ.get("PROBE_TOL", "1e-7"))
CHUNK = int(os.environ.get("PROBE_CHUNK", "40"))
MODE = os.environ.get("PROBE_MODE", "mixed")

problem = m.problem()
options = Options(optimality_tolerance=TOL, max_iterations=300,
                  ldlt_unroll=False)


def make(seed):
    keys = jax.random.split(jax.random.PRNGKey(seed), BATCH)
    thetas, x1s = jax.vmap(m.random_instance)(keys)
    bounds = jax.tree.map(
        lambda a: jnp.broadcast_to(a, (BATCH,) + a.shape), m.bounds())
    u0 = jnp.broadcast_to(m.initial_controls(), (BATCH, m.T, m.NU))
    return bounds, x1s, u0, thetas


def run(args):
    b, x, u, th = args
    if MODE == "f64":
        return solve_chunked(problem, b, x, u, theta=th, options=options,
                             chunk=CHUNK, batched=True)
    compact = tuple(s for s in (BATCH // 2, BATCH // 4, BATCH // 8,
                                BATCH // 16) if s >= 64) or False
    # quadrotor-specific phase-1 knobs (measured on CPU, round 4): the
    # large terminal weights put the f32 KKT plateau at ~5e-3, above the
    # concar default 3e-4 — phase 1 must hand off at 1e-2 (a genuine f32
    # warm start; 4/4 converge in pure-f64-like totals) and a stall window
    # promotes any straggler instead of burning the f32 budget.
    return solve_mixed_chunked(problem, b, x, u, theta=th, options=options,
                               chunk=CHUNK, phase1_tolerance=1e-2,
                               phase1_stall_window=10,
                               phase2_max_iterations=40,
                               phase2_ls_speculative=8,
                               rescue_failed="restart", phase2_chunk=8,
                               phase2_compact=compact, batched=True)


print(f"quadrotor probe: b{BATCH} {MODE} tol {TOL}")
t0 = time.time()
sol = run(make(1))
np.asarray(sol.converged)
print(f"  warm (compile+solve): {time.time() - t0:.1f}s")

t0 = time.time()
sol = run(make(42))
np.asarray(sol.converged)
wall = time.time() - t0
stats = batch_stats(sol)
solved = int(stats.num_converged)
print(f"  solved {solved}/{BATCH} in {wall:.1f}s = "
      f"{solved / wall:.2f} OCPs/s/chip "
      f"(median iters {float(stats.median_iterations):.0f}, "
      f"max {int(stats.max_iterations)})")
