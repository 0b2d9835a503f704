"""Headline benchmark: batched concar instances solved to KKT tol per chip.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "ocps_per_s_per_chip", "vs_baseline": N}

Baseline: the reference solves one concar instance in a median 121.4 ms
single-threaded (BASELINE.md) => 8.24 OCPs/s. Our value is batched
instances solved to the same tolerance divided by wall time on one chip
(compile excluded; solve includes every instance reaching convergence or
max_iterations in the lockstep batch).

Env knobs: BENCH_BATCH (default 256), BENCH_TOL (1e-7), BENCH_DTYPE
(f64|f32, default f64 to match the reference's tolerance regime).
"""

import json
import os
import time

import jax

jax.config.update("jax_enable_x64", True)
# Persistent compile cache: the solver's nested-control-flow HLO is expensive
# for the TPU toolchain; cache hits make repeat bench runs start in seconds.
_cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402

from ipddp2tpu import Options  # noqa: E402
from ipddp2tpu.batch import batch_stats, solve_batch  # noqa: E402
from ipddp2tpu.models import concar  # noqa: E402

REFERENCE_MEDIAN_WALL_S = 0.1214  # BASELINE.md concar IPDDP2 median


def main():
    batch = int(os.environ.get("BENCH_BATCH", "256"))
    tol = float(os.environ.get("BENCH_TOL", "1e-7"))
    dtype = jnp.float64 if os.environ.get(
        "BENCH_DTYPE", "f64") == "f64" else jnp.float32

    options = Options(optimality_tolerance=tol, max_iterations=600,
                      ldlt_unroll=False)
    problem = concar.problem()

    keys = jax.random.split(jax.random.PRNGKey(0), batch)
    thetas, f_lims, tau_lims, x1s = jax.vmap(
        lambda k: concar.random_instance(k, dtype=dtype))(keys)
    bounds = concar.bounds(f_lims, tau_lims, dtype=dtype)
    u0 = jnp.broadcast_to(concar.initial_controls(dtype),
                          (batch, concar.T, concar.NU))

    run = jax.jit(lambda b, x, u, th: solve_batch(
        problem, b, x, u, theta=th, options=options))

    # compile + warm up on a DIFFERENT instance set (excluded from timing;
    # the timed call must use fresh inputs — the execution layer may memoize
    # identical program+input runs)
    keys_w = jax.random.split(jax.random.PRNGKey(1), batch)
    thetas_w, f_w, t_w, x1_w = jax.vmap(
        lambda k: concar.random_instance(k, dtype=dtype))(keys_w)
    sol = run(concar.bounds(f_w, t_w, dtype=dtype), x1_w, u0, thetas_w)
    import numpy as _np
    _np.asarray(sol.converged)

    t0 = time.time()
    sol = run(bounds, x1s, u0, thetas)
    import numpy as np
    np.asarray(sol.converged)   # host read: async backends may not block
    wall = time.time() - t0

    stats = batch_stats(sol)
    solved = int(stats.num_converged)
    value = solved / wall
    baseline = 1.0 / REFERENCE_MEDIAN_WALL_S
    print(json.dumps({
        "metric": "concar OCPs solved to KKT tol per second per chip",
        "value": round(value, 3),
        "unit": "ocps_per_s_per_chip",
        "vs_baseline": round(value / baseline, 3),
        "detail": {
            "batch": batch,
            "solved": solved,
            "wall_s": round(wall, 3),
            "tol": tol,
            "dtype": str(jnp.dtype(dtype)),
            "median_iterations": float(stats.median_iterations),
            "max_iterations": int(stats.max_iterations),
            "device": str(jax.devices()[0]),
            "baseline_ocps_per_s": round(baseline, 3),
        },
    }))


if __name__ == "__main__":
    main()
