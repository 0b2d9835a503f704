import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np
from ipddp2tpu import Options
from ipddp2tpu.backward import backward_pass
from ipddp2tpu.parallel.priccati import backward_pass_parallel
from ipddp2tpu.derivatives import evaluate_derivatives, relax_constraints
from ipddp2tpu.models import concar
from ipddp2tpu.solve import dual_error
from scripts.debug_solve import debug_run

opts = Options(optimality_tolerance=1e-7, backward_mode="parallel",
               max_iterations=30)
prob = concar.problem()
theta, f_lim, tau_lim, x1 = concar.seed1_instance()
bounds = concar.bounds(f_lim, tau_lim)
s = debug_run(prob, bounds, x1, concar.initial_controls(), theta=theta,
              options=opts, max_print=0)
print("state k=", int(s.k))
deriv = evaluate_derivatives(prob, theta, s.x, s.u, s.phi)
c_rel = relax_constraints(prob, s.c_raw, s.mu)
nominal = (c_rel, s.il, s.iu, s.phi, s.zl, s.zu)
opts_seq = Options(optimality_tolerance=1e-7)
bw1 = backward_pass(prob, deriv, nominal, s.mu, s.reg_last, opts_seq)
bw2 = backward_pass_parallel(prob, deriv, nominal, s.mu, s.reg_last, opts_seq)
dlam = float(jnp.max(jnp.abs(bw1.lam - bw2.lam)))
print("dlam:", dlam, "lam1 norm:", float(jnp.max(jnp.abs(bw1.lam))))
du1 = dual_error(prob, deriv, bounds, s.phi, s.zl, s.zu, bw1.lam, opts_seq)
du2 = dual_error(prob, deriv, bounds, s.phi, s.zl, s.zu, bw2.lam, opts_seq)
print("du seq:", float(du1), "du par:", float(du2))
# where does lam differ most?
d = np.abs(np.asarray(bw1.lam - bw2.lam)).max(axis=1)
print("worst stages:", np.argsort(d)[-5:], d.max())
