"""Phase split of the mixed-precision bench config on the real chip.

Times the f32 bulk phase and the f64 endgame separately at the bench
tolerance (1e-7), reporting per-phase wall, iteration counts, and the
implied OCPs/s. Env: PROBE_BATCH (64), PROBE_CHUNK (40), PROBE_P1TOL (3e-4).
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
from ipddp2tpu.chunked import run_chunked, solve_chunked
from ipddp2tpu.mixed import promote_state
from ipddp2tpu.models import concar
from ipddp2tpu.problem import Bounds

BATCH = int(os.environ.get("PROBE_BATCH", "64"))
CHUNK = int(os.environ.get("PROBE_CHUNK", "40"))
P1TOL = float(os.environ.get("PROBE_P1TOL", "3e-4"))
TOL = float(os.environ.get("PROBE_TOL", "1e-7"))

problem = concar.problem()
SPEC = int(os.environ.get("PROBE_SPEC", "0"))          # phase-1 LS mode
P2SPEC = int(os.environ.get("PROBE_P2SPEC", "0"))      # phase-2 LS mode
RESCUE = bool(int(os.environ.get("PROBE_RESCUE", "1")))
P2MAX = int(os.environ.get("PROBE_P2MAX", "0")) or None
options = Options(optimality_tolerance=TOL, max_iterations=600,
                  ldlt_unroll=False, ls_speculative=SPEC)
opts32 = options.__class__(**{
    **options.__dict__, "optimality_tolerance": P1TOL})


def make(seed):
    keys = jax.random.split(jax.random.PRNGKey(seed), BATCH)
    thetas, f_lims, tau_lims, x1s = jax.vmap(concar.random_instance)(keys)
    u0 = jnp.broadcast_to(concar.initial_controls(),
                          (BATCH, concar.T, concar.NU))
    return concar.bounds(f_lims, tau_lims), x1s, u0, thetas


def run_once(seed, label):
    bounds, x1s, u0, thetas = make(seed)
    cast32 = lambda a: (a.astype(jnp.float32)
                        if jnp.issubdtype(a.dtype, jnp.floating) else a)
    b32, x32, u32, th32 = jax.tree.map(cast32, (bounds, x1s, u0, thetas))

    t0 = time.time()
    _, s32 = solve_chunked(problem, b32, x32, u32, theta=th32,
                           options=opts32, chunk=CHUNK, batched=True,
                           return_state=True)
    k32 = np.asarray(s32.k)
    t1 = time.time()

    opts64 = (options if not P2SPEC else options.__class__(
        **{**options.__dict__, "ls_speculative": P2SPEC}))
    s64 = jax.vmap(
        lambda st, bb, tt: promote_state(problem, bb, st, tt, opts64),
        in_axes=(0, Bounds(0, 0), 0))(s32, bounds, thetas)
    total2 = None
    if P2MAX is not None:
        total2 = np.minimum(600, np.asarray(s64.k) + P2MAX)
    if not RESCUE:
        base = np.asarray(600) if total2 is None else total2
        total2 = np.where(np.asarray(s32.converged), base,
                          np.asarray(s64.k))
    s64 = run_chunked(problem, bounds, s64, thetas, opts64, chunk=CHUNK,
                      batched=True, total=total2)
    conv = np.asarray(s64.converged)
    t2 = time.time()

    k64 = np.asarray(s64.k) - k32
    solved = int(conv.sum())
    total = t2 - t0
    pct = lambda a: np.percentile(a, [50, 75, 90, 95, 99, 100]).astype(int)
    print(f"{label}: b={BATCH} f32 {t1 - t0:.1f}s "
          f"(iters med {np.median(k32):.0f} max {k32.max()}), "
          f"f64 {t2 - t1:.1f}s (iters med {np.median(k64):.0f} "
          f"max {k64.max()}), solved {solved}/{BATCH} "
          f"-> {solved / total:.3f} OCPs/s", flush=True)
    print(f"  k32 p50/75/90/95/99/100: {pct(k32)}", flush=True)
    print(f"  k64 p50/75/90/95/99/100: {pct(k64)}", flush=True)
    print(f"  unconverged: {int((~conv).sum())}, their k32 "
          f"{k32[~conv] if (~conv).any() else '[]'} k64 "
          f"{k64[~conv] if (~conv).any() else '[]'}", flush=True)


SEEDS = [int(s) for s in os.environ.get("PROBE_SEEDS", "1,2").split(",")]
run_once(SEEDS[0], "warm(compile)")
for sd in SEEDS[1:]:
    run_once(sd, f"measured s{sd} ")
