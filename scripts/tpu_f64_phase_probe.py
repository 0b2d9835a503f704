"""Honest on-chip phase attribution for the f64 endgame iteration.

Each phase is timed as REPS chained executions inside ONE jitted dispatch
(rep k's input is perturbed by rep k-1's output), so the ~30-50 ms relay
round-trip and the result-download cost are amortized over REPS and XLA
cannot CSE the repeats. Host reads only a tiny scalar.

Env: PROBE_BATCH (64), PROBE_REPS (10).
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
from ipddp2tpu.backward import backward_pass, costate_scan
from ipddp2tpu.chunked import solve_chunked
from ipddp2tpu.derivatives import (contract_dynamics_hessian,
                                   evaluate_derivatives, relax_constraints)
from ipddp2tpu.forward import forward_pass, rollout
from ipddp2tpu.models import concar
from ipddp2tpu.problem import Bounds
from ipddp2tpu.solve import _nominal_trial

BATCH = int(os.environ.get("PROBE_BATCH", "64"))
REPS = int(os.environ.get("PROBE_REPS", "10"))
# PROBE_DTYPE=f32 attributes the bulk-phase iteration instead (same rows;
# the "f64" labels then read as the probe dtype)
DT = jnp.float32 if os.environ.get("PROBE_DTYPE") == "f32" else jnp.float64

prob = concar.problem()
keys = jax.random.split(jax.random.PRNGKey(7), BATCH)
thetas, f_lims, tau_lims, x1s = jax.vmap(concar.random_instance)(keys)
u0 = jnp.broadcast_to(concar.initial_controls(), (BATCH, concar.T, concar.NU))
bounds = concar.bounds(f_lims, tau_lims)
cDT = lambda a: (a.astype(DT)
                 if jnp.issubdtype(a.dtype, jnp.floating) else a)
thetas, x1s, u0, bounds = jax.tree.map(cDT, (thetas, x1s, u0, bounds))

options = Options(optimality_tolerance=1e-10, max_iterations=30,
                  ldlt_unroll=False)

# mid-solve state: warm up in f32 (a 30-iteration f64 chunk at b1024 is a
# long-enough device program to CRASH the TPU worker — observed round 3;
# the attribution only needs a typical mid-solve state, so run the cheap
# f32 phase and promote), then cast to f64.
t0 = time.time()
c32 = lambda a: (a.astype(jnp.float32)
                 if jnp.issubdtype(a.dtype, jnp.floating) else a)
_, s32 = solve_chunked(prob, *jax.tree.map(c32, (bounds, x1s, u0)),
                       theta=jax.tree.map(c32, thetas), options=options,
                       chunk=30, batched=True, return_state=True)
np.asarray(s32.k)
c64 = lambda a: (a.astype(DT)
                 if jnp.issubdtype(a.dtype, jnp.floating) else a)
s = jax.tree.map(c64, s32)
print(f"warmup 30 f32 iters + promote: {time.time() - t0:.1f}s", flush=True)


def chained(name, fn, seed_args, out_to_eps):
    """fn(*args) executed REPS times inside one jit; rep k's first arg is
    nudged by a scalar derived from rep k-1's output (defeats CSE, keeps
    the chain sequential)."""

    @jax.jit
    def loop(args):
        eps = jnp.asarray(0.0, DT)

        def body(k, carry):
            eps, _ = carry
            a = jax.tree.map(
                lambda x: x * (1 + 1e-14 * eps)
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
    print(f"{name:32s} {wall / REPS * 1e3:9.1f} ms/rep "
          f"({wall:.2f}s / {REPS})", flush=True)


vm = lambda f, *in_axes: jax.vmap(f, in_axes=in_axes)
first = lambda out: jnp.sum(jax.tree.leaves(out)[0][0]).astype(DT) * 1e-30

# --- derivatives (first-order + cH_phi) ---
chained("derivatives (f64)", vm(
    lambda th, x, u, p: evaluate_derivatives(prob, th, x, u, p), 0, 0, 0, 0),
    (thetas, s.x, s.u, s.phi), first)

deriv = jax.jit(vm(lambda th, x, u, p: evaluate_derivatives(
    prob, th, x, u, p), 0, 0, 0, 0))(thetas, s.x, s.u, s.phi)

chained("costate scan assoc (f64)", vm(
    lambda d, p: costate_scan(d, p, mode="assoc"), 0, 0),
    (deriv, s.phi), first)
chained("costate scan seq/xla (f64)", vm(
    lambda d, p: costate_scan(d, p, mode="seq"), 0, 0),
    (deriv, s.phi), first)
lam = jax.jit(vm(lambda d, p: costate_scan(d, p), 0, 0))(deriv, s.phi)

chained("hessian contraction (f64)", vm(
    lambda th, x, u, l: contract_dynamics_hessian(prob, th, x, u, l),
    0, 0, 0, 0), (thetas, s.x, s.u, lam[:, 1:]), first)

second = jax.jit(vm(lambda th, x, u, l: contract_dynamics_hessian(
    prob, th, x, u, l), 0, 0, 0, 0))(thetas, s.x, s.u, lam[:, 1:])
second = second + deriv.cH_phi
c_rel = jax.vmap(lambda c, m: relax_constraints(prob, c, m))(s.c_raw, s.mu)
nominal = (c_rel, s.il, s.iu, s.phi, s.zl, s.zu)

# the XLA f64 ladder at b>=512 is a long-enough device program to crash
# the TPU worker (observed round 3); keep the comparison opt-in
kerns = (("auto", "xla") if (BATCH <= 256
                             or os.environ.get("PROBE_XLA_LADDER"))
         else ("auto",))
for kern in kerns:
    opts_k = Options(optimality_tolerance=1e-10, ldlt_unroll=False,
                     backward_kernel=kern)
    chained(f"backward ladder ({kern})", vm(
        lambda d, n, m, r, la, se: backward_pass(
            prob, d, n, m, r, opts_k, lam=la, second=se),
        0, 0, 0, 0, 0, 0),
        (deriv, nominal, s.mu, s.reg_last, lam, second), first)

opts_k = Options(optimality_tolerance=1e-10, ldlt_unroll=False,
                 backward_kernel="auto")
bw = jax.jit(vm(lambda d, n, m, r, la, se: backward_pass(
    prob, d, n, m, r, opts_k, lam=la, second=se), 0, 0, 0, 0, 0, 0))(
    deriv, nominal, s.mu, s.reg_last, lam, second)

chained("rollout x1 (f64)", vm(
    lambda th, b, g, x, u, p, zl, zu: rollout(
        prob, th, b, g, x, u, p, zl, zu, jnp.asarray(1.0, DT)),
    0, Bounds(0, 0), 0, 0, 0, 0, 0, 0),
    (thetas, bounds, bw.gains, s.x, s.u, s.phi, s.zl, s.zu), first)

chained("forward pass full LS (f64)", vm(
    lambda th, b, g, nt, dL, mu, tc, lc, mp, fp: forward_pass(
        prob, th, b, g, nt, dL, mu, tc, lc, mp, fp, options),
    0, Bounds(0, 0), 0, 0, 0, 0, 0, 0, 0, 0),
    (thetas, bounds, bw.gains, jax.vmap(_nominal_trial)(s), bw.dL,
     s.mu, s.theta_curr, s.L_curr, s.min_primal_1, s.filter_pts), first)

from ipddp2tpu.forward import forward_pass_speculative  # noqa: E402

for fk in ("pallas", "xla"):
    opts_s = Options(optimality_tolerance=1e-10, ldlt_unroll=False,
                     ls_speculative=8, forward_kernel=fk)
    chained(f"forward spec-8 LS ({fk}, f64)", vm(
        lambda th, b, g, nt, dL, mu, tc, lc, mp, fp: forward_pass_speculative(
            prob, th, b, g, nt, dL, mu, tc, lc, mp, fp, opts_s),
        0, Bounds(0, 0), 0, 0, 0, 0, 0, 0, 0, 0),
        (thetas, bounds, bw.gains, jax.vmap(_nominal_trial)(s), bw.dL,
         s.mu, s.theta_curr, s.L_curr, s.min_primal_1, s.filter_pts), first)
