"""On-chip A/B for the fused prologue sweep (ops/prologue_pallas.py).

Times the f32 iteration prologue (derivatives + seq costate + dynamics-
Hessian contraction) as REPS chained executions inside ONE dispatch
(tpu_f64_phase_probe.py harness: rep k's input nudged by rep k-1's output
so XLA cannot CSE, host reads one scalar), XLA composition vs the fused
Pallas kernel, and checks parity on the same mid-solve state.

Env: PROBE_BATCH (1024), PROBE_REPS (10).
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
from ipddp2tpu.backward import _prologue_batched, costate_scan
from ipddp2tpu.chunked import solve_chunked
from ipddp2tpu.derivatives import (contract_dynamics_hessian,
                                   evaluate_derivatives)
from ipddp2tpu.models import concar

BATCH = int(os.environ.get("PROBE_BATCH", "1024"))
REPS = int(os.environ.get("PROBE_REPS", "10"))
DT = jnp.float32

prob = concar.problem()
keys = jax.random.split(jax.random.PRNGKey(7), BATCH)
thetas, f_lims, tau_lims, x1s = jax.vmap(concar.random_instance)(keys)
u0 = jnp.broadcast_to(concar.initial_controls(), (BATCH, concar.T, concar.NU))
bounds = concar.bounds(f_lims, tau_lims)
c32 = lambda a: (a.astype(DT)
                 if jnp.issubdtype(a.dtype, jnp.floating) else a)
thetas, x1s, u0, bounds = jax.tree.map(c32, (thetas, x1s, u0, bounds))

options = Options(optimality_tolerance=1e-10, max_iterations=30,
                  ldlt_unroll=False)

t0 = time.time()
_, s = solve_chunked(prob, bounds, x1s, u0, theta=thetas, options=options,
                     chunk=30, batched=True, return_state=True)
np.asarray(s.k)
print(f"warmup 30 f32 iters: {time.time() - t0:.1f}s", flush=True)


def chained(name, fn, seed_args, out_to_eps):
    @jax.jit
    def loop(args):
        def body(k, carry):
            eps, _ = carry
            a = jax.tree.map(
                lambda x: x * (1 + 1e-7 * eps)
                if jnp.issubdtype(x.dtype, jnp.floating) else x, args)
            out = fn(*a)
            return out_to_eps(out), out

        out0 = fn(*args)
        eps, out = jax.lax.fori_loop(1, REPS, body, (out_to_eps(out0), out0))
        return eps

    e = loop(seed_args)
    np.asarray(e)                   # compile
    t0 = time.time()
    e = loop(seed_args)
    np.asarray(e)
    wall = time.time() - t0
    print(f"{name:34s} {wall / REPS * 1e3:9.1f} ms/rep "
          f"({wall:.2f}s / {REPS})", flush=True)


vm = lambda f, *in_axes: jax.vmap(f, in_axes=in_axes)
first = lambda out: jnp.sum(jax.tree.leaves(out)[0][0]).astype(DT) * 1e-30


def xla_prologue(th, x, u, p):
    """The exact compute_prologue vmap-fallback composition."""
    def one(th_, x_, u_, p_):
        deriv = evaluate_derivatives(prob, th_, x_, u_, p_)
        lam = costate_scan(deriv, p_)            # auto -> seq/xla on TPU
        second = deriv.cH_phi + contract_dynamics_hessian(
            prob, th_, x_, u_, lam[1:])
        return deriv._replace(fH=None, cH_phi=None), lam, second
    return jax.vmap(one)(th, x, u, p)


chained("prologue XLA (f32)", xla_prologue,
        (thetas, s.x, s.u, s.phi), first)
chained("prologue fused kernel (f32)",
        lambda th, x, u, p: _prologue_batched(prob, th, x, u, p),
        (thetas, s.x, s.u, s.phi), first)

# --- parity on the same state ---
ref = jax.jit(xla_prologue)(thetas, s.x, s.u, s.phi)
got = jax.jit(lambda th, x, u, p: _prologue_batched(prob, th, x, u, p))(
    thetas, s.x, s.u, s.phi)


def rel(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    d = np.max(np.abs(a - b))
    return d / max(1e-30, np.max(np.abs(a)))


names = ["fx", "fu", "lx", "lu", "lxx", "lux", "luu", "cx", "cu"]
for n in names:
    print(f"parity {n:8s} relmax {rel(getattr(ref[0], n), getattr(got[0], n)):.3e}")
print(f"parity lam      relmax {rel(ref[1], got[1]):.3e}")
print(f"parity second   relmax {rel(ref[2], got[2]):.3e}")
