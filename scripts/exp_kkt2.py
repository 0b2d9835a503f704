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
from ipddp2tpu.solve import initialize

prob, bounds, theta = m.problem(), m.bounds(), m.seed1_instance()
opts = Options(optimality_tolerance=1e-7, inertia_method="ldl")
s = initialize(prob, theta, bounds, m.initial_state(), m.initial_controls(), opts)
deriv = evaluate_derivatives(prob, theta, s.x, s.u, s.phi)
c_rel = relax_constraints(prob, s.c_raw, s.mu)
nominal = (c_rel, s.il, s.iu, s.phi, s.zl, s.zu)
*_, fail, singular, (K, rhs, X, ok, n_pos, sok) = _run_pass(
    prob, deriv, nominal, s.mu, jnp.zeros(()), jnp.zeros(()), opts,
    collect_kkt=True)
ok, n_pos, sok = np.asarray(ok), np.asarray(n_pos), np.asarray(sok)
bad = np.where(~ok)[0]
print("fail:", bool(fail), "bad stages:", bad[:20])
for t in bad[:6]:
    print(f"t={t} n_pos={n_pos[t]} solve_ok={bool(sok[t])}")
    w = np.linalg.eigvalsh(np.asarray(K[t]))
    print("   np_true:", (w > 1e-12).sum(), "min|w|:", np.abs(w).min())
    if not sok[t]:
        r = np.asarray(K[t]) @ np.asarray(X[t]) - np.asarray(rhs[t])
        print("   resid:", np.linalg.norm(r), "scale:",
              np.linalg.norm(np.asarray(K[t])) * np.linalg.norm(np.asarray(X[t]))
              + np.linalg.norm(np.asarray(rhs[t])))
