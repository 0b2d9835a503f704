"""From the cached stall state: collect all per-stage KKTs, compare LDLT vs
eigh vs numpy-truth inertia and solve accuracy per stage."""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np
from ipddp2tpu import Options
from ipddp2tpu.backward import _run_pass
from ipddp2tpu.derivatives import evaluate_derivatives, relax_constraints
from ipddp2tpu.models import cartpole as m
from ipddp2tpu.ops.ldlt import ldlt_factor, ldlt_solve_refined
from ipddp2tpu.solve import SolverState

d = np.load("/tmp/cartpole_stall.npz")
s = SolverState(**{f: jnp.asarray(d[f]) for f in SolverState._fields})
prob, bounds, theta = m.problem(), m.bounds(), m.seed1_instance()
options = Options(optimality_tolerance=1e-7, inertia_method="eigh")
deriv = evaluate_derivatives(prob, theta, s.x, s.u, s.phi)
c_rel = relax_constraints(prob, s.c_raw, s.mu)
nominal = (c_rel, s.il, s.iu, s.phi, s.zl, s.zu)
gains, lam, dL, fail, singular, (K, rhs, X) = _run_pass(
    prob, deriv, nominal, s.mu, jnp.zeros(()), jnp.zeros(()), options,
    collect_kkt=True)
K, rhs, X = np.asarray(K), np.asarray(rhs), np.asarray(X)
nu = prob.nu
print("stage | np_true np_ldl np_eig | cond | rel_resid_eigh rel_resid_ldl rel_err_vs_np")
for t in [99, 98, 60, 56, 50, 0, 25]:
    w = np.linalg.eigvalsh(K[t])
    np_true = int((w > 1e-12).sum())
    f_ldl = ldlt_factor(jnp.asarray(K[t]))
    x_ldl = np.asarray(ldlt_solve_refined(f_ldl, jnp.asarray(K[t]),
                                          jnp.asarray(rhs[t]), refine_steps=1))
    x_np = np.linalg.solve(K[t], rhs[t])
    r_eig = np.linalg.norm(K[t] @ X[t] - rhs[t]) / np.linalg.norm(rhs[t])
    r_ldl = np.linalg.norm(K[t] @ x_ldl - rhs[t]) / np.linalg.norm(rhs[t])
    err_eig = np.abs(X[t] - x_np).max() / max(1, np.abs(x_np).max())
    err_ldl = np.abs(x_ldl - x_np).max() / max(1, np.abs(x_np).max())
    print(f"{t:4d} | {np_true} {int(f_ldl.n_pos)}({int(f_ldl.ok)}) "
          f"{int((w>1e-12).sum())} | {np.abs(w).max()/np.abs(w).min():.1e} | "
          f"eig:{r_eig:.1e}/{err_eig:.1e} ldl:{r_ldl:.1e}/{err_ldl:.1e}")
