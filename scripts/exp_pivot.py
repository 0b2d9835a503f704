"""Validate pivoted LDLT on both hard regimes: initial-pass Ks and stall Ks."""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np
from functools import partial
from ipddp2tpu import Options
from ipddp2tpu.backward import _run_pass
from ipddp2tpu.derivatives import evaluate_derivatives, relax_constraints
from ipddp2tpu.models import cartpole as m
from ipddp2tpu.ops.ldlt import ldlt_factor_pivoted, ldlt_solve_refined
from ipddp2tpu.solve import SolverState, initialize

prob, bounds, theta = m.problem(), m.bounds(), m.seed1_instance()
opts = Options(optimality_tolerance=1e-7, inertia_method="eigh")

def collect(s):
    deriv = evaluate_derivatives(prob, theta, s.x, s.u, s.phi)
    c_rel = relax_constraints(prob, s.c_raw, s.mu)
    nominal = (c_rel, s.il, s.iu, s.phi, s.zl, s.zu)
    *_, dbg = _run_pass(prob, deriv, nominal, s.mu, jnp.zeros(()),
                        jnp.zeros(()), opts, collect_kkt=True)
    return dbg[0], dbg[1]

@jax.jit
def check(K, rhs):
    f = jax.vmap(ldlt_factor_pivoted)(K)
    x, ok = jax.vmap(partial(ldlt_solve_refined, refine_steps=1,
                             check_residual=True))(f, K, rhs)
    return f.n_pos, f.n_zero, ok, x

def report(name, K, rhs):
    n_pos, n_zero, sok, x = check(K, rhs)
    Kn, rn, xn = np.asarray(K), np.asarray(rhs), np.asarray(x)
    w = np.linalg.eigvalsh(Kn)
    np_true = (w > 1e-12).sum(axis=1)
    resid = (np.linalg.norm(Kn @ xn - rn, axis=(1, 2))
             / (np.linalg.norm(Kn, axis=(1, 2)) * np.linalg.norm(xn, axis=(1, 2))
                + np.linalg.norm(rn, axis=(1, 2))))
    mism = int((np.asarray(n_pos) != np_true).sum())
    print(f"{name}: inertia mismatches={mism} max_resid={resid.max():.1e} "
          f"solve_ok_false={int((~np.asarray(sok)).sum())} "
          f"n_zero>0: {int((np.asarray(n_zero) > 0).sum())}")

s0 = initialize(prob, theta, bounds, m.initial_state(), m.initial_controls(), opts)
K0, r0 = collect(s0)
report("initial-pass", K0, r0)

d = np.load("/tmp/cartpole_stall.npz")
ss = SolverState(**{f: jnp.asarray(d[f]) for f in SolverState._fields})
Ks, rs = collect(ss)
report("stall", Ks, rs)
