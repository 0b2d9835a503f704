"""Prewarm the host-final wave's CPU programs for every lane size.

The success rung's native-f64 host-CPU wave (mixed._host_final_wave) pads
the residue to a power of two in {8, 16, 32, 64} and compacts through
(16, 8). A certified bench run only compiles the sizes its residue happens
to draw (usually 16); a different seed drawing 8/32/64 would pay a cold
XLA:CPU compile of the full f64 solver INSIDE the measured success rep.
This script compiles all four lane programs (plus their compaction-rung
programs) into .jax_cache with EXACTLY the wave's options (derived from
the bench options the way _host_final_wave derives them), in an axon
process with CPU-committed data — the same compile keys the wave hits.

Run on an idle box; ~minutes of XLA:CPU compile the first time, seconds
after.
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

# the bench worker's options (bench.py worker()) -> the wave's derivation
# (mixed._host_final_wave opts_h)
bench_opts = Options(optimality_tolerance=float(os.environ.get(
    "BENCH_TOL", "1e-7")), max_iterations=600, ldlt_unroll=False)
opts_h = bench_opts.__class__(**{
    **bench_opts.__dict__, "auto_tune": False, "ls_speculative": 0,
    "ls_spec_continue": False,
    "backward_kernel": "xla", "forward_kernel": "xla",
    "max_iterations": 1000})

problem = concar.problem()
cpu = jax.devices("cpu")[0]

for target in (8, 16, 32, 64):
    keys = jax.random.split(jax.random.PRNGKey(3), target)
    thetas, f_lims, tau_lims, x1s = jax.vmap(concar.random_instance)(keys)
    u0 = jnp.broadcast_to(concar.initial_controls(),
                          (target, concar.T, concar.NU))
    put = lambda tree: jax.device_put(
        jax.tree.map(lambda a: np.asarray(a, np.float64)
                     if np.issubdtype(np.asarray(a).dtype, np.floating)
                     else np.asarray(a), tree), cpu)
    compact = tuple(s for s in (16, 8) if s < target) or None
    t0 = time.time()
    with jax.default_device(cpu):
        _, s_h = solve_chunked(
            problem, put(concar.bounds(f_lims, tau_lims)), put(x1s),
            put(u0), theta=put(thetas), options=opts_h, chunk=60,
            batched=True, return_state=True, compact_sizes=compact)
    conv = int(np.asarray(s_h.converged).sum())
    print(f"lanes {target:3d} (compact {compact}): {conv}/{target} "
          f"in {time.time() - t0:.1f}s", flush=True)
