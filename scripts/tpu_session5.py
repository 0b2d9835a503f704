"""Round 2 matrix: parallel backward + speculative LS + pallas + mixed."""
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
from ipddp2tpu.mixed import solve_mixed
from ipddp2tpu.models import concar

problem = concar.problem()

def make_batch(batch, seed, dtype):
    keys = jax.random.split(jax.random.PRNGKey(seed), batch)
    thetas, f_lims, tau_lims, x1s = jax.vmap(
        lambda k: concar.random_instance(k, dtype=dtype))(keys)
    u0 = concar.initial_controls(dtype)
    return (concar.bounds(f_lims, tau_lims, dtype=dtype), x1s,
            jnp.broadcast_to(u0, (batch, concar.T, concar.NU)), thetas)

def cfg(tag, iters, batch, *, spec=0, dtype=jnp.float64, tol=1e-7,
        bmode="scan", pallas=False, mixed=False):
    options = Options(optimality_tolerance=tol, ldlt_unroll=False,
                      max_iterations=iters, ls_speculative=spec,
                      backward_mode=bmode, use_pallas_kkt=pallas)
    if mixed:
        from ipddp2tpu import Bounds
        fn = jax.jit(jax.vmap(
            lambda b, x, u, th: solve_mixed(problem, b, x, u, theta=th,
                                            options=options),
            in_axes=(Bounds(0, 0), 0, 0, 0)))
    else:
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
              f"{r/max(kmax,1)*1000:.0f}ms kmax={kmax} conv={conv}/{batch} "
              f"ocps={conv/r:.2f}", flush=True)
    except Exception as e:
        print(f"[{tag}] FAILED {type(e).__name__}: {str(e)[:100]}", flush=True)

which = sys.argv[1] if len(sys.argv) > 1 else "all"
if which in ("all", "pbwd"):
    cfg("f32 b8 pbwd",        30, 8,  dtype=jnp.float32, tol=1e-5, bmode="parallel")
    cfg("f32 b8 pbwd+spec",   30, 8,  dtype=jnp.float32, tol=1e-5, bmode="parallel", spec=18)
    cfg("f32 b64 pbwd+spec",  30, 64, dtype=jnp.float32, tol=1e-5, bmode="parallel", spec=18)
    cfg("f32 b8 pbwd+pallas", 30, 8,  dtype=jnp.float32, tol=1e-5, bmode="parallel", pallas=True)
if which in ("all", "full"):
    cfg("f32 b64 FULL solve",  600, 64, dtype=jnp.float32, tol=1e-5)
    cfg("f32 b64 FULL pbwd+spec", 600, 64, dtype=jnp.float32, tol=1e-5, bmode="parallel", spec=18)
    cfg("mixed b16 FULL",      600, 16, mixed=True)
