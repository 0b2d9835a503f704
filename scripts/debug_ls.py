"""Dissect the failing line search at the cartpole stall."""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np
from ipddp2tpu import Options
from ipddp2tpu.backward import backward_pass
from ipddp2tpu.derivatives import evaluate_derivatives, relax_constraints
from ipddp2tpu.forward import (barrier_lagrangian, filter_blocks,
                               fraction_to_boundary_ok, rollout)
from ipddp2tpu.models import cartpole as m
from ipddp2tpu.solve import initialize
from scripts.debug_solve import debug_run

options = Options(optimality_tolerance=1e-7, inertia_method="eigh",
                  max_iterations=58)
theta = m.seed1_instance()
prob, bounds = m.problem(), m.bounds()
s = debug_run(prob, bounds, m.initial_state(), m.initial_controls(),
              theta=theta, options=options, max_print=0)
deriv = evaluate_derivatives(prob, theta, s.x, s.u, s.phi)
c_rel = relax_constraints(prob, s.c_raw, s.mu)
bw = backward_pass(prob, deriv, (c_rel, s.il, s.iu, s.phi, s.zl, s.zu),
                   s.mu, s.reg_last, options)
mu = float(s.mu); dL = float(bw.dL)
tau = max(options.tau_min, 1.0 - mu)
th_prev, L_prev = float(s.theta_curr), float(s.L_curr)
print(f"mu={mu:.2e} dL={dL:.3e} th_prev={th_prev:.6e} L_prev={L_prev:.10e}")
print(f"min_primal={float(s.min_primal_1):.2e} filter_n={int(s.filter_n)}")
fp = np.asarray(s.filter_pts)
print("filter pts:", fp[(fp[:,0] != np.inf)][:10])
gamma = 1.0
for i in range(18):
    trial = rollout(prob, theta, bounds, bw.gains, s.x, s.u, s.phi,
                    s.zl, s.zu, jnp.asarray(gamma))
    finite = bool(jnp.all(jnp.isfinite(trial.u)) & jnp.all(jnp.isfinite(trial.x))
                  & jnp.all(jnp.isfinite(trial.phi)) & jnp.all(jnp.isfinite(trial.zl))
                  & jnp.all(jnp.isfinite(trial.zu)) & jnp.all(jnp.isfinite(trial.c_raw)))
    frac = bool(fraction_to_boundary_ok(trial, s.il, s.iu, s.zl, s.zu, tau))
    c_t = relax_constraints(prob, trial.c_raw, mu)
    th = float(jnp.sum(jnp.abs(c_t)))
    L, J = barrier_lagrangian(prob, theta, bounds, trial.x, trial.u, c_t,
                              trial.phi, trial.il, trial.iu, mu)
    L = float(L)
    blocked = bool(filter_blocks(s.filter_pts, th, L))
    sw = (dL < 0) and ((max(-gamma*dL,0))**options.s_L * gamma**(1-options.s_L)
                       > options.delta * th_prev**options.s_theta)
    armijo = L - L_prev - 10*2.220446049250313e-16*abs(L_prev) <= options.eta_L*gamma*dL
    suff = (th <= (1-options.gamma_theta)*th_prev) or (L <= L_prev - options.gamma_L*th_prev)
    use_armijo = (th <= float(s.min_primal_1)) and sw
    print(f"g={gamma:.1e} fin={int(finite)} frac={int(frac)} blk={int(blocked)} "
          f"sw={int(sw)} arm={int(armijo)} suff={int(suff)} "
          f"th={th:.6e} L-L_prev={L-L_prev:+.3e}")
    gamma *= 0.5
