"""Python-loop replica of ipddp2tpu.solve.run for debugging: prints the
reference-style iteration table (iter, objective, theta, errors, mu, reg,
step) so iterate trajectories can be diffed against the reference solver."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp

from ipddp2tpu import Options, solve as _solve
from ipddp2tpu.backward import backward_pass
from ipddp2tpu.derivatives import evaluate_derivatives, relax_constraints
from ipddp2tpu.forward import forward_pass
from ipddp2tpu.solve import (_augment_filter, _nominal_trial, _reset_filter,
                             cs_error, dual_error, initialize)


def debug_run(problem, bounds, x1, u_init, theta=None,
              options=Options(), max_print=2000):
    s = initialize(problem, theta, bounds, x1, u_init, options)
    tol = options.optimality_tolerance
    num_bounds = bounds.num_bounds

    @jax.jit
    def analyze(s, theta):
        deriv = evaluate_derivatives(problem, theta, s.x, s.u, s.phi,
                                     quasi_newton=options.quasi_newton)
        c_rel = relax_constraints(problem, s.c_raw, s.mu)
        nominal = (c_rel, s.il, s.iu, s.phi, s.zl, s.zu)
        if options.backward_mode == "parallel":
            from ipddp2tpu.parallel.priccati import backward_pass_parallel
            bw = backward_pass_parallel(problem, deriv, nominal, s.mu,
                                        s.reg_last, options)
        else:
            bw = backward_pass(problem, deriv, nominal, s.mu, s.reg_last,
                               options)
        d_inf = dual_error(problem, deriv, bounds, s.phi, s.zl, s.zu,
                           bw.lam, options)
        return bw, c_rel, d_inf

    @jax.jit
    def fw(s, theta, gains, dL):
        return forward_pass(problem, theta, bounds, gains,
                            _nominal_trial(s), dL, s.mu, s.theta_curr,
                            s.L_curr, s.min_primal_1, s.filter_pts, options)

    it = 0
    while it < options.max_iterations:
        bw, c_rel, d_inf = analyze(s, theta)
        s = s._replace(lam=bw.lam, reg_last=bw.reg)
        if int(bw.status) != 0:
            print(f"BACKWARD FAILED at k={int(s.k)} reg={float(bw.reg):.3e}")
            return s
        p_inf = jnp.max(jnp.abs(c_rel))
        cs0 = cs_error(bounds, s.il, s.iu, s.zl, s.zu, 0.0, options)
        cs_mu = cs_error(bounds, s.il, s.iu, s.zl, s.zu, s.mu, options)
        err0 = max(float(d_inf), float(cs0), float(p_inf))
        errmu = max(float(d_inf), float(cs_mu), float(p_inf))
        if err0 < tol:
            print(f"CONVERGED k={int(s.k)} obj={float(s.objective):.8e}")
            return s._replace(converged=jnp.asarray(True))
        if (errmu <= options.kappa_eps * float(s.mu)
                and float(num_bounds) > 0 and float(s.mu) > tol / 10):
            mu_new = max(tol / 10, min(options.kappa_mu * float(s.mu),
                                       float(s.mu) ** options.theta_mu))
            from ipddp2tpu.forward import barrier_lagrangian
            c_rel_new = relax_constraints(problem, s.c_raw, mu_new)
            L_new, J = barrier_lagrangian(problem, theta, bounds, s.x, s.u,
                                          c_rel_new, s.phi, s.il, s.iu,
                                          mu_new)
            s = s._replace(
                mu=jnp.asarray(mu_new, s.mu.dtype),
                filter_pts=_reset_filter(s.filter_pts, s.max_primal_1),
                filter_n=jnp.int32(1), L_curr=L_new,
                theta_curr=jnp.sum(jnp.abs(c_rel_new)), objective=J,
                j=s.j + 1)
            print(f"  [barrier] mu -> {mu_new:.3e}")
            continue
        fw_res = fw(s, theta, bw.gains, bw.dL)
        if int(fw_res.status) != 0:
            print(f"LINE SEARCH FAILED k={int(s.k)} gamma last "
                  f"dL={float(bw.dL):.3e} theta={float(s.theta_curr):.3e}")
            return s._replace(status=fw_res.status)
        if it < max_print:
            print(f"k={int(s.k):4d} obj={float(fw_res.objective): .8e} "
                  f"th={float(fw_res.theta_next):.2e} du={float(d_inf):.2e} "
                  f"cs={float(cs0):.2e} pr={float(p_inf):.2e} "
                  f"mu={float(s.mu):.1e} reg={float(bw.reg):.1e} "
                  f"g={float(fw_res.step_size):.1e} ls={int(fw_res.num_ls)}")
        t = fw_res.trial
        if bool((~fw_res.armijo_passed) & (~fw_res.switching)):
            fpts, fn = _augment_filter(s.filter_pts, s.filter_n,
                                       s.theta_curr, s.L_curr, options)
        else:
            fpts, fn = s.filter_pts, s.filter_n
        s = s._replace(x=t.x, u=t.u, c_raw=t.c_raw, il=t.il, iu=t.iu,
                       phi=t.phi, zl=t.zl, zu=t.zu,
                       objective=fw_res.objective, L_curr=fw_res.L_next,
                       theta_curr=fw_res.theta_next, filter_pts=fpts,
                       filter_n=fn, k=s.k + 1, step_size=fw_res.step_size)
        it += 1
    print("MAX ITERS")
    return s


if __name__ == "__main__":
    name = sys.argv[1] if len(sys.argv) > 1 else "cartpole"
    method = sys.argv[2] if len(sys.argv) > 2 else "ldl"
    bmode = sys.argv[3] if len(sys.argv) > 3 else "scan"
    opts = Options(optimality_tolerance=1e-7, inertia_method=method,
                   backward_mode=bmode)
    if name == "cartpole":
        from ipddp2tpu.models import cartpole as m
        debug_run(m.problem(), m.bounds(), m.initial_state(),
                  m.initial_controls(), theta=m.seed1_instance(),
                  options=opts)
    elif name == "acrobot":
        from ipddp2tpu.models import acrobot as m
        debug_run(m.problem(), m.bounds(), m.initial_state(),
                  m.initial_controls(), theta=m.seed1_instance(),
                  options=opts)
    elif name == "pushing":
        from ipddp2tpu.models import pushing as m
        debug_run(m.problem(), m.bounds(), m.initial_state(),
                  m.initial_controls(), theta=m.seed1_instance(),
                  options=opts)
    elif name == "double_integrator":
        from ipddp2tpu.models import double_integrator as m
        debug_run(m.problem(), m.bounds(), m.initial_state(),
                  m.initial_controls(), options=opts)
    elif name == "concar":
        from ipddp2tpu.models import concar as m
        theta, f_lim, tau_lim, x1 = m.seed1_instance()
        debug_run(m.problem(), m.bounds(f_lim, tau_lim), x1,
                  m.initial_controls(), theta=theta, options=opts)
