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
from ipddp2tpu.solve import initialize
from ipddp2tpu.ops.ldlt import ldlt_factor_pivoted, ldlt_solve
import importlib

m = importlib.import_module("ipddp2tpu.models.acrobot")
prob, bounds, theta = m.problem(), m.bounds(), m.seed1_instance()
opts = Options(optimality_tolerance=1e-7, inertia_method="ldl")
s = initialize(prob, theta, bounds, m.initial_state(), m.initial_controls(), opts)
deriv = evaluate_derivatives(prob, theta, s.x, s.u, s.phi)
c_rel = relax_constraints(prob, s.c_raw, s.mu)
nominal = (c_rel, s.il, s.iu, s.phi, s.zl, s.zu)
*_, (K, rhs, X, ok, n_pos, sok) = _run_pass(
    prob, deriv, nominal, s.mu, jnp.zeros(()), jnp.zeros(()), opts,
    collect_kkt=True)
t = 9
Kt = np.asarray(K[t]); bt = np.asarray(rhs[t])
print("||K|| =", np.abs(Kt).max(), "cond =", np.linalg.cond(Kt))
f = ldlt_factor_pivoted(K[t])
ld = np.asarray(f.ld)
print("pivots:", np.array2string(np.diag(ld), precision=2, max_line_width=100))
print("max |L| =", np.abs(np.tril(ld, -1)).max())
print("perm:", np.asarray(f.perm))
x = np.asarray(ldlt_solve(f, rhs[t]))
print("direct solve resid:", np.linalg.norm(Kt @ x - bt))
x_np = np.linalg.solve(Kt, bt)
print("numpy resid:", np.linalg.norm(Kt @ x_np - bt))
# check the factorization itself: P K P' = L D L'?
P = np.asarray(f.perm)
L = np.tril(ld, -1) + np.eye(ld.shape[0])
A2 = L @ np.diag(np.diag(ld)) @ L.T
print("factorization error:", np.abs(A2 - Kt[P][:, P]).max())
