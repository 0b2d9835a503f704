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
np.save("/tmp/acrobot_K9.npy", np.asarray(K[9]))
np.save("/tmp/acrobot_rhs9.npy", np.asarray(rhs[9]))
print("saved")
