"""Inspect LDLT breakdown at the initial cartpole backward pass (vmapped)."""
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
from ipddp2tpu.ops.ldlt import ldlt_factor, ldlt_solve_refined
from ipddp2tpu.solve import initialize

prob, bounds, theta = m.problem(), m.bounds(), m.seed1_instance()
options = Options(optimality_tolerance=1e-7, inertia_method="eigh")
s = initialize(prob, theta, bounds, m.initial_state(), m.initial_controls(),
               options)
deriv = evaluate_derivatives(prob, theta, s.x, s.u, s.phi)
c_rel = relax_constraints(prob, s.c_raw, s.mu)
nominal = (c_rel, s.il, s.iu, s.phi, s.zl, s.zu)
*_, (K, rhs, X) = _run_pass(prob, deriv, nominal, s.mu, jnp.zeros(()),
                            jnp.zeros(()), options, collect_kkt=True)

@jax.jit
def check(K, rhs):
    f = jax.vmap(ldlt_factor)(K)
    solve = jax.vmap(partial(ldlt_solve_refined, refine_steps=1,
                             check_residual=True))
    x, ok = solve(f, K, rhs)
    return f.n_pos, f.ok, ok, x

n_pos, fok, sok, x = check(K, rhs)
Kn, rhsn = np.asarray(K), np.asarray(rhs)
w = np.linalg.eigvalsh(Kn)
np_true = (w > 1e-12).sum(axis=1)
nu = prob.nu
bad = np.where((np.asarray(n_pos) != np_true) | (~np.asarray(sok))
               | (np_true != nu))[0]
print("nu =", nu, "bad stages:", bad[:20])
for t in bad[:5]:
    resid = np.linalg.norm(Kn[t] @ np.asarray(x[t]) - rhsn[t]) / (
        np.linalg.norm(Kn[t]) * np.linalg.norm(np.asarray(x[t]))
        + np.linalg.norm(rhsn[t]))
    print(f"t={t} np_true={np_true[t]} np_ldl={int(n_pos[t])} "
          f"fok={bool(fok[t])} sok={bool(sok[t])} resid={resid:.1e}")
    d = np.diag(np.asarray(ldlt_factor(K[t]).ld))
    print("  pivots:", np.array2string(d, precision=1, max_line_width=120))
