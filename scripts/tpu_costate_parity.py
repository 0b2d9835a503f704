"""On-chip numerical parity of the Pallas costate sweep vs the XLA scan.

Interpret-mode parity (tests/test_costate_pallas.py) checks the kernel's
math but not the Mosaic lowering's arithmetic; this script runs BOTH
dispatches on the real chip from a mid-solve state and reports the
max-abs and relative deviation of the costate trajectories, plus timing.

Env: PARITY_BATCH (f32 batch, 1024), PARITY_BATCH_F64 (256 — a 30-iter
f64 warmup at b1024 is a known TPU-worker crash trigger, CLAUDE.md
round-3), PARITY_ITERS (warmup iterations, 30).
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
from ipddp2tpu.backward import costate_scan
from ipddp2tpu.chunked import solve_chunked
from ipddp2tpu.derivatives import evaluate_derivatives
from ipddp2tpu.models import concar

assert jax.default_backend() == "tpu", "needs the real chip"

K = int(os.environ.get("PARITY_ITERS", "30"))
prob = concar.problem()


def mid_state(batch, dtype):
    keys = jax.random.split(jax.random.PRNGKey(11), batch)
    thetas, f_lims, tau_lims, x1s = jax.vmap(concar.random_instance)(keys)
    u0 = jnp.broadcast_to(concar.initial_controls(),
                          (batch, concar.T, concar.NU))
    bounds = concar.bounds(f_lims, tau_lims)
    c = lambda a: (a.astype(dtype)
                   if jnp.issubdtype(a.dtype, jnp.floating) else a)
    thetas, x1s, u0, bounds = jax.tree.map(c, (thetas, x1s, u0, bounds))
    options = Options(optimality_tolerance=1e-7, max_iterations=K,
                      auto_tune=False, ldlt_unroll=False)
    sol = solve_chunked(prob, bounds, x1s, u0, theta=thetas,
                        options=options, chunk=15, batched=True)
    return thetas, sol


def check(batch, dtype, label):
    thetas, s = mid_state(batch, dtype)
    vm = lambda f, *ax: jax.vmap(f, in_axes=ax)
    deriv = jax.jit(vm(lambda th, x, u, p: evaluate_derivatives(
        prob, th, x, u, p), 0, 0, 0, 0))(thetas, s.x, s.u, s.phi)

    lam = {}
    for kern in ("xla", "auto"):
        fn = jax.jit(vm(lambda d, p: costate_scan(
            d, p, mode="seq", kernel=kern), 0, 0))
        t0 = time.time()
        out = np.asarray(fn(deriv, s.phi))
        lam[kern] = out
        print(f"  {label} kernel={kern}: {time.time() - t0:.1f}s "
              f"(compile+run)", flush=True)
    d = np.abs(lam["xla"] - lam["auto"])
    scale = np.maximum(np.abs(lam["xla"]), 1.0)
    print(f"{label}: max abs dev {d.max():.3e}  "
          f"max rel dev {(d / scale).max():.3e}", flush=True)
    eps = 1e-5 if dtype == jnp.float32 else 1e-12
    ok = (d / scale).max() < eps
    print(f"{label}: {'PARITY OK' if ok else '** PARITY FAIL **'}",
          flush=True)
    return ok


ok32 = check(int(os.environ.get("PARITY_BATCH", "1024")),
             jnp.float32, "f32 b1024")
ok64 = check(int(os.environ.get("PARITY_BATCH_F64", "256")),
             jnp.float64, "f64 b256")
print("COSTATE PARITY", "OK" if (ok32 and ok64) else "FAIL", flush=True)
