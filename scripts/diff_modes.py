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
from ipddp2tpu.forward import forward_pass
from ipddp2tpu.models import concar
from ipddp2tpu.solve import _nominal_trial, initialize
from ipddp2tpu.solve import _augment_filter

options = Options(optimality_tolerance=1e-7)
prob = concar.problem()
theta, f_lim, tau_lim, x1 = concar.seed1_instance()
bounds = concar.bounds(f_lim, tau_lim)
s = initialize(prob, theta, bounds, x1, concar.initial_controls(), options)

@jax.jit
def both(s):
    deriv = evaluate_derivatives(prob, theta, s.x, s.u, s.phi)
    c_rel = relax_constraints(prob, s.c_raw, s.mu)
    nominal = (c_rel, s.il, s.iu, s.phi, s.zl, s.zu)
    bw1 = backward_pass(prob, deriv, nominal, s.mu, s.reg_last, options)
    bw2 = backward_pass_parallel(prob, deriv, nominal, s.mu, s.reg_last,
                                 options)
    return bw1, bw2

@jax.jit
def fw_step(s, gains, dL):
    return forward_pass(prob, theta, bounds, gains, _nominal_trial(s), dL,
                        s.mu, s.theta_curr, s.L_curr, s.min_primal_1,
                        s.filter_pts, options)

for it in range(40):
    bw1, bw2 = both(s)
    da = float(jnp.max(jnp.abs(bw1.gains.alpha - bw2.gains.alpha)))
    dp = float(jnp.max(jnp.abs(bw1.gains.psi - bw2.gains.psi)))
    scale = float(jnp.max(jnp.abs(bw1.gains.alpha))) + 1e-30
    print(f"it={it} mu={float(s.mu):.1e} reg1={float(bw1.reg):.1e} "
          f"reg2={float(bw2.reg):.1e} st={int(bw1.status)}/{int(bw2.status)} "
          f"dalpha={da:.2e} (rel {da/scale:.1e}) dpsi={dp:.2e} "
          f"dL={float(bw1.dL):.3e}/{float(bw2.dL):.3e}", flush=True)
    if da / scale > 1e-4:
        print("DIVERGED at it", it)
        break
    # advance with the sequential gains (ground truth path)
    r = fw_step(s, bw1.gains, bw1.dL)
    if int(r.status) != 0:
        print("fw fail"); break
    t = r.trial
    if bool((~r.armijo_passed) & (~r.switching)):
        fpts, fn = _augment_filter(s.filter_pts, s.filter_n, s.theta_curr,
                                   s.L_curr, options)
    else:
        fpts, fn = s.filter_pts, s.filter_n
    s = s._replace(x=t.x, u=t.u, c_raw=t.c_raw, il=t.il, iu=t.iu, phi=t.phi,
                   zl=t.zl, zu=t.zu, objective=r.objective, L_curr=r.L_next,
                   theta_curr=r.theta_next, filter_pts=fpts, filter_n=fn,
                   k=s.k+1, lam=bw1.lam, reg_last=bw1.reg)
