"""TPU measurement matrix: unroll / speculative-LS / dtype / batch ladder."""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))
import jax
jax.config.update("jax_enable_x64", True)
cache = os.path.join(os.path.dirname(__file__), os.pardir, ".jax_cache")
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np
from ipddp2tpu import Options
from ipddp2tpu.batch import solve_batch
from ipddp2tpu.models import concar

problem = concar.problem()

def make_batch(batch, seed, dtype):
    keys = jax.random.split(jax.random.PRNGKey(seed), batch)
    thetas, f_lims, tau_lims, x1s = jax.vmap(
        lambda k: concar.random_instance(k, dtype=dtype))(keys)
    u0 = concar.initial_controls(dtype)
    return (concar.bounds(f_lims, tau_lims, dtype=dtype), x1s,
            jnp.broadcast_to(u0, (batch, concar.T, concar.NU)), thetas)

def cfg(tag, iters, batch, *, unroll=False, spec=0, dtype=jnp.float64,
        tol=1e-7, bmode="scan"):
    options = Options(optimality_tolerance=tol, ldlt_unroll=unroll,
                      max_iterations=iters, ls_speculative=spec,
                      backward_mode=bmode)
    fn = jax.jit(lambda b, x, u, th: solve_batch(
        problem, b, x, u, theta=th, options=options))
    try:
        a1 = make_batch(batch, 0, dtype)
        t0 = time.time()
        sol = fn(*a1); np.asarray(sol.converged)
        c = time.time() - t0
        a2 = make_batch(batch, 1, dtype)
        t0 = time.time()
        sol = fn(*a2); np.asarray(sol.converged)
        r = time.time() - t0
        kmax = int(jnp.max(sol.iterations))
        conv = int(jnp.sum(sol.converged))
        print(f"[{tag}] c+r={c:.0f}s run={r:.2f}s per_iter="
              f"{r/max(kmax,1)*1000:.0f}ms kmax={kmax} conv={conv}/{batch}",
              flush=True)
    except Exception as e:
        print(f"[{tag}] FAILED {type(e).__name__}: {str(e)[:100]}", flush=True)

cfg("f64 b8 base",        30, 8)
cfg("f64 b8 unroll",      30, 8, unroll=True)
cfg("f64 b8 specLS",      30, 8, spec=24)
cfg("f64 b8 parallel-bwd",30, 8, bmode="parallel")
cfg("f32 b8 base",        30, 8, dtype=jnp.float32, tol=1e-5)
cfg("f32 b64",            30, 64, dtype=jnp.float32, tol=1e-5)
cfg("f32 b256",           30, 256, dtype=jnp.float32, tol=1e-5)
cfg("f64 b64 retry",      30, 64)
