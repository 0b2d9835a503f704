"""On-chip numerical parity of the Pallas costate sweep vs the XLA scan.

Interpret-mode parity (tests/test_costate_pallas.py) checks the kernel's
math but not the Mosaic lowering's arithmetic; this script builds a
mid-solve state on the real chip and compares BOTH dispatches
trajectory-wide (f32 kernel and the df64 pair kernel), with timing.

The warmup mirrors scripts/tpu_f64_phase_probe.py exactly (b1024, f32,
chunk 30, tol 1e-10, 30 iters) so its programs come out of the shared
.jax_cache; the f64 leg promotes the f32 state by cast — a from-scratch
f64 warmup is both uncached and a known worker-crash trigger at b1024
(CLAUDE.md round-3).

Env: PARITY_BATCH (1024), PARITY_ITERS (30).
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

BATCH = int(os.environ.get("PARITY_BATCH", "1024"))
K = int(os.environ.get("PARITY_ITERS", "30"))
prob = concar.problem()

keys = jax.random.split(jax.random.PRNGKey(7), BATCH)
thetas, f_lims, tau_lims, x1s = jax.vmap(concar.random_instance)(keys)
u0 = jnp.broadcast_to(concar.initial_controls(),
                      (BATCH, concar.T, concar.NU))
bounds = concar.bounds(f_lims, tau_lims)
options = Options(optimality_tolerance=1e-10, max_iterations=K,
                  ldlt_unroll=False)

t0 = time.time()
c32 = lambda a: (a.astype(jnp.float32)
                 if jnp.issubdtype(a.dtype, jnp.floating) else a)
th32 = jax.tree.map(c32, thetas)
_, s32 = solve_chunked(prob, *jax.tree.map(c32, (bounds, x1s, u0)),
                       theta=th32, options=options,
                       chunk=30, batched=True, return_state=True)
np.asarray(s32.k)
print(f"warmup {K} f32 iters: {time.time() - t0:.1f}s", flush=True)


def check(s, th, label, lam_ref=None):
    """Accuracy vs a true-f64 reference, not cross-implementation equality:
    the df64 kernel has a ~49-bit effective mantissa (not f64's 53) and the
    f32 kernel differs from the XLA scan only in accumulation order, so
    both legitimately deviate from the XLA output; what matters is that
    the KERNEL is no farther from the f64 reference than XLA is (same
    error class), and for same-precision f32 that the two stay within the
    recursion's roundoff growth."""
    vm = lambda f, *ax: jax.vmap(f, in_axes=ax)
    deriv = jax.jit(vm(lambda t, x, u, p: evaluate_derivatives(
        prob, t, x, u, p), 0, 0, 0, 0))(th, s.x, s.u, s.phi)

    lam = {}
    for kern in ("xla", "auto"):
        fn = jax.jit(vm(lambda d, p: costate_scan(
            d, p, mode="seq", kernel=kern), 0, 0))
        out = np.asarray(fn(deriv, s.phi))         # compile + run
        t0 = time.time()
        out = np.asarray(fn(jax.tree.map(
            lambda a: a * (1 + np.asarray(1e-7, a.dtype))
            if jnp.issubdtype(a.dtype, jnp.floating) else a, deriv), s.phi))
        lam[kern] = out
        print(f"  {label} kernel={kern}: {time.time() - t0 :.2f}s warm "
              f"(fresh inputs)", flush=True)
    d = np.abs(lam["xla"] - lam["auto"])
    scale = np.maximum(np.abs(lam["xla"]), 1.0)
    rel = (d / scale).max()
    print(f"{label}: xla-vs-kernel max rel dev {rel:.3e}", flush=True)
    if lam_ref is None:
        # this IS the f64 leg: XLA output (true f64) is the reference for
        # the df64 kernel; accept the double-single precision model
        # (2^-48 per op x ~T growth ~ 1e-10)
        ok = rel < 1e-9
        print(f"{label}: {'PARITY OK' if ok else '** PARITY FAIL **'} "
              f"(df64-vs-f64 budget 1e-9)", flush=True)
        return ok, np.asarray(lam["xla"])
    # f32 leg: compare both against the f64 reference computed from the
    # same (f32-exact) state — the kernel must not be a worse
    # approximation than the XLA scan
    # compare in f64 against the f64 reference (casting the reference down
    # would put its own ~6e-8 cast error inside the measured quantity)
    e_xla = (np.abs(lam["xla"].astype(np.float64) - lam_ref)
             / np.maximum(np.abs(lam_ref), 1.0))
    e_ker = (np.abs(lam["auto"].astype(np.float64) - lam_ref)
             / np.maximum(np.abs(lam_ref), 1.0))
    print(f"{label}: err-vs-f64ref xla {e_xla.max():.3e} "
          f"kernel {e_ker.max():.3e}", flush=True)
    ok = e_ker.max() <= 3.0 * max(e_xla.max(), 1e-6)
    print(f"{label}: {'PARITY OK' if ok else '** PARITY FAIL **'} "
          f"(kernel error within 3x of XLA's own f32 error)", flush=True)
    return ok, None


c64 = lambda a: (a.astype(jnp.float64)
                 if jnp.issubdtype(a.dtype, jnp.floating) else a)
# f64 leg first: its XLA output doubles as the f32 leg's high-precision
# reference (the f64 state is the exact cast of the f32 state)
ok64, lam_ref = check(jax.tree.map(c64, s32), jax.tree.map(c64, th32),
                      f"f64 b{BATCH}")
ok32, _ = check(s32, th32, f"f32 b{BATCH}", lam_ref=lam_ref)
print("COSTATE PARITY", "OK" if (ok32 and ok64) else "FAIL", flush=True)
