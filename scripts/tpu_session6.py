"""Chunked f64 batch scaling + fixed-precision mixed mode."""
import os, sys, time
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
from ipddp2tpu.mixed import solve_mixed_chunked
from ipddp2tpu.models import concar

problem = concar.problem()
options = Options(optimality_tolerance=1e-7, max_iterations=600,
                  ldlt_unroll=False)

def make(batch, seed):
    keys = jax.random.split(jax.random.PRNGKey(seed), batch)
    thetas, f_lims, tau_lims, x1s = jax.vmap(concar.random_instance)(keys)
    u0 = jnp.broadcast_to(concar.initial_controls(),
                          (batch, concar.T, concar.NU))
    return concar.bounds(f_lims, tau_lims), x1s, u0, thetas

def cfg(tag, batch, mode, chunk=20):
    try:
        fn = (solve_mixed_chunked if mode == "mixed" else solve_chunked)
        a1 = make(batch, 1)
        t0 = time.time()
        sol = fn(problem, *a1[:3], theta=a1[3], options=options,
                 chunk=chunk, batched=True)
        np.asarray(sol.converged)
        c = time.time() - t0
        a2 = make(batch, 0)
        t0 = time.time()
        sol = fn(problem, *a2[:3], theta=a2[3], options=options,
                 chunk=chunk, batched=True)
        conv = int(np.asarray(sol.converged).sum())
        r = time.time() - t0
        print(f"[{tag}] c+r={c:.0f}s run={r:.1f}s conv={conv}/{batch} "
              f"ocps={conv/r:.3f} medit={float(np.median(np.asarray(sol.iterations))):.0f}",
              flush=True)
    except Exception as e:
        print(f"[{tag}] FAILED {type(e).__name__}: {str(e)[:90]}", flush=True)

cfg("mixed b16", 16, "mixed")
cfg("f64 b16", 16, "f64")
cfg("f64 b32", 32, "f64", chunk=10)
cfg("mixed b32", 32, "mixed", chunk=10)
