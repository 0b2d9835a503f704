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
opts_ldl = Options(optimality_tolerance=1e-7, inertia_method="ldl")
s = initialize(prob, theta, bounds, m.initial_state(), m.initial_controls(),
               opts_ldl)
deriv = evaluate_derivatives(prob, theta, s.x, s.u, s.phi)
c_rel = relax_constraints(prob, s.c_raw, s.mu)
nominal = (c_rel, s.il, s.iu, s.phi, s.zl, s.zu)
gains, lam, dL, fail, singular = _run_pass(
    prob, deriv, nominal, s.mu, jnp.zeros(()), jnp.zeros(()), opts_ldl)
print("ldl at reg=0: fail=", bool(fail), "singular=", bool(singular),
      "dL=", float(dL))
