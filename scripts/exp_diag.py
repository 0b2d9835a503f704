"""Per-stage diagnosis of the first backward pass for a given model."""
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
import importlib

name = sys.argv[1] if len(sys.argv) > 1 else "acrobot"
reg = float(sys.argv[2]) if len(sys.argv) > 2 else 0.0
m = importlib.import_module(f"ipddp2tpu.models.{name}")
prob, bounds, theta = m.problem(), m.bounds(), m.seed1_instance()
opts = Options(optimality_tolerance=1e-7, inertia_method="ldl")
s = initialize(prob, theta, bounds, m.initial_state(), m.initial_controls(), opts)
deriv = evaluate_derivatives(prob, theta, s.x, s.u, s.phi)
c_rel = relax_constraints(prob, s.c_raw, s.mu)
nominal = (c_rel, s.il, s.iu, s.phi, s.zl, s.zu)
*_, fail, sing, (K, rhs, X, ok, n_pos, sok) = _run_pass(
    prob, deriv, nominal, s.mu, jnp.asarray(reg, jnp.float64),
    jnp.zeros(()), opts, collect_kkt=True)
ok, n_pos, sok = map(np.asarray, (ok, n_pos, sok))
bad = np.where(~ok)[0]
print(f"{name} reg={reg}: fail={bool(fail)} singular={bool(sing)} "
      f"bad={bad[:12]} nu={prob.nu}")
for t in list(bad[-3:]):
    w = np.linalg.eigvalsh(np.asarray(K[t]))
    r = np.asarray(K[t]) @ np.asarray(X[t]) - np.asarray(rhs[t])
    rel = np.linalg.norm(r) / (np.linalg.norm(np.asarray(K[t]))
                               * np.linalg.norm(np.asarray(X[t]))
                               + np.linalg.norm(np.asarray(rhs[t])))
    print(f"  t={t} n_pos_ldl={n_pos[t]} np_true={(w>1e-12).sum()} "
          f"sok={bool(sok[t])} rel_resid={rel:.1e} "
          f"minw={np.abs(w).min():.1e} K_finite={np.isfinite(np.asarray(K[t])).all()}")
