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
from ipddp2tpu.solve import initialize

prob, bounds, theta = m.problem(), m.bounds(), m.seed1_instance()
opts = Options(optimality_tolerance=1e-7, inertia_method="ldl")
s = initialize(prob, theta, bounds, m.initial_state(), m.initial_controls(), opts)
deriv = evaluate_derivatives(prob, theta, s.x, s.u, s.phi)
c_rel = relax_constraints(prob, s.c_raw, s.mu)
nominal = (c_rel, s.il, s.iu, s.phi, s.zl, s.zu)
*_, (K, rhs, X, ok, n_pos, sok) = _run_pass(
    prob, deriv, nominal, s.mu, jnp.zeros(()), jnp.zeros(()), opts,
    collect_kkt=True)
sokn = np.asarray(sok)
bad = np.where(~sokn)[0]
print("in-scan solve_ok False at stages:", bad)
print("first failing stage in scan order (largest t):", bad.max() if len(bad) else None)
# re-run externally on the exact same failing K
for t in bad[-3:]:
    f = ldlt_factor_pivoted(K[t])
    x2, ok2 = ldlt_solve_refined(f, K[t], rhs[t], refine_steps=1,
                                 check_residual=True)
    rin = np.linalg.norm(np.asarray(K[t]) @ np.asarray(X[t]) - np.asarray(rhs[t]))
    rout = np.linalg.norm(np.asarray(K[t]) @ np.asarray(x2) - np.asarray(rhs[t]))
    print(f"t={t}: external ok={bool(ok2)} resid_out={rout:.2e} resid_in={rin:.2e}")
