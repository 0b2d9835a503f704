"""Experiments from the cached stall state: does continuing with a reset
filter (restoration-lite) escape the stall?"""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np
from ipddp2tpu import Options
from ipddp2tpu.solve import SolverState, _reset_filter
from ipddp2tpu.models import cartpole as m
from scripts.debug_solve import debug_run

d = np.load("/tmp/cartpole_stall.npz")
s = SolverState(**{f: jnp.asarray(d[f]) for f in SolverState._fields})
print("loaded k=", int(s.k), "mu=", float(s.mu), "obj=", float(s.objective))

# Experiment: reset the filter at the stalled state and continue the loop
mode = sys.argv[1] if len(sys.argv) > 1 else "reset_filter"
options = Options(optimality_tolerance=1e-7, inertia_method="eigh",
                  max_iterations=400)
prob, bounds = m.problem(), m.bounds()
theta = m.seed1_instance()

if mode == "reset_filter":
    s = s._replace(filter_pts=_reset_filter(s.filter_pts, s.max_primal_1),
                   filter_n=jnp.int32(1), status=jnp.int32(0))

# continue the debug loop from this state
from ipddp2tpu.backward import backward_pass
from ipddp2tpu.derivatives import evaluate_derivatives, relax_constraints
from ipddp2tpu.forward import forward_pass, barrier_lagrangian
from ipddp2tpu.solve import (_augment_filter, _nominal_trial, cs_error,
                             dual_error)

@jax.jit
def analyze(s):
    deriv = evaluate_derivatives(prob, theta, s.x, s.u, s.phi)
    c_rel = relax_constraints(prob, s.c_raw, s.mu)
    bw = backward_pass(prob, deriv, (c_rel, s.il, s.iu, s.phi, s.zl, s.zu),
                       s.mu, s.reg_last, options)
    d_inf = dual_error(prob, deriv, bounds, s.phi, s.zl, s.zu, bw.lam, options)
    return bw, c_rel, d_inf

@jax.jit
def fw(s, gains, dL):
    return forward_pass(prob, theta, bounds, gains, _nominal_trial(s), dL,
                        s.mu, s.theta_curr, s.L_curr, s.min_primal_1,
                        s.filter_pts, options)

tol = 1e-7
for it in range(200):
    bw, c_rel, d_inf = analyze(s)
    s = s._replace(lam=bw.lam, reg_last=bw.reg)
    p_inf = float(jnp.max(jnp.abs(c_rel)))
    cs0 = float(cs_error(bounds, s.il, s.iu, s.zl, s.zu, 0.0, options))
    cs_mu = float(cs_error(bounds, s.il, s.iu, s.zl, s.zu, s.mu, options))
    err0 = max(float(d_inf), cs0, p_inf)
    errmu = max(float(d_inf), cs_mu, p_inf)
    if err0 < tol:
        print(f"CONVERGED it={it} k={int(s.k)} obj={float(s.objective):.8e}")
        break
    if errmu <= 10.0 * float(s.mu) and float(s.mu) > tol / 10:
        mu_new = max(tol/10, min(0.2*float(s.mu), float(s.mu)**1.2))
        c_new = relax_constraints(prob, s.c_raw, mu_new)
        L_new, J = barrier_lagrangian(prob, theta, bounds, s.x, s.u, c_new,
                                      s.phi, s.il, s.iu, mu_new)
        s = s._replace(mu=jnp.asarray(mu_new), L_curr=L_new,
                       filter_pts=_reset_filter(s.filter_pts, s.max_primal_1),
                       filter_n=jnp.int32(1),
                       theta_curr=jnp.sum(jnp.abs(c_new)), objective=J)
        print(f"  [barrier] mu -> {mu_new:.2e}")
        continue
    r = fw(s, bw.gains, bw.dL)
    if int(r.status) != 0:
        if mode == "reset_on_fail":
            print(f"  [LS fail at it={it}; resetting filter]")
            s = s._replace(filter_pts=_reset_filter(s.filter_pts, s.max_primal_1),
                           filter_n=jnp.int32(1))
            continue
        print(f"LS FAILED it={it} du={float(d_inf):.2e}")
        break
    t = r.trial
    if bool((~r.armijo_passed) & (~r.switching)):
        fpts, fn = _augment_filter(s.filter_pts, s.filter_n, s.theta_curr,
                                   s.L_curr, options)
    else:
        fpts, fn = s.filter_pts, s.filter_n
    s = s._replace(x=t.x, u=t.u, c_raw=t.c_raw, il=t.il, iu=t.iu, phi=t.phi,
                   zl=t.zl, zu=t.zu, objective=r.objective, L_curr=r.L_next,
                   theta_curr=r.theta_next, filter_pts=fpts, filter_n=fn,
                   k=s.k+1, step_size=r.step_size)
    if it % 10 == 0 or it < 6:
        print(f"it={it} du={float(d_inf):.2e} th={float(r.theta_next):.2e} "
              f"g={float(r.step_size):.1e} mu={float(s.mu):.1e}")
print("final obj", float(s.objective), "k", int(s.k))
