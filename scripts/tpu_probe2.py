import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))
import jax
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np

which = sys.argv[1]
t0 = time.time()
if which == "ldlt":
    from ipddp2tpu.ops.ldlt import ldlt_factor_pivoted, ldlt_solve_refined
    A = jnp.asarray(np.random.default_rng(0).standard_normal((14, 14)))
    A = (A + A.T) / 2
    b = jnp.ones((14, 5))
    f = jax.jit(lambda A, b: ldlt_solve_refined(
        ldlt_factor_pivoted(A, unroll=False), A, b, check_residual=True))
    x, ok = f(A, b); jax.block_until_ready(x)
    print("ldlt f64 compile+run:", time.time() - t0, flush=True)
elif which == "tri":
    b = jnp.ones((14, 5))
    L = jnp.tril(jnp.ones((14, 14))) + 13 * jnp.eye(14)
    f = jax.jit(lambda L, b: jax.scipy.linalg.solve_triangular(L, b, lower=True))
    x = f(L, b); jax.block_until_ready(x)
    print("triangular_solve f64:", time.time() - t0, flush=True)
elif which == "deriv":
    from ipddp2tpu.derivatives import evaluate_derivatives
    from ipddp2tpu.models import concar
    problem = concar.problem()
    theta, f_lim, tau_lim, x1 = concar.seed1_instance()
    x = jnp.zeros((101, 4)); u = jnp.full((100, 10), 0.01)
    phi = jnp.zeros((100, 4))
    f = jax.jit(lambda x, u, phi: evaluate_derivatives(problem, theta, x, u, phi))
    d = f(x, u, phi); jax.block_until_ready(d.fx)
    print("derivatives compile+run:", time.time() - t0, flush=True)
elif which == "bwd":
    from ipddp2tpu import Options
    from ipddp2tpu.backward import backward_pass
    from ipddp2tpu.derivatives import evaluate_derivatives, relax_constraints
    from ipddp2tpu.models import concar
    from ipddp2tpu.solve import initialize
    options = Options(optimality_tolerance=1e-7, ldlt_unroll=False)
    problem = concar.problem()
    theta, f_lim, tau_lim, x1 = concar.seed1_instance()
    bounds = concar.bounds(f_lim, tau_lim)
    s = initialize(problem, theta, bounds, x1, concar.initial_controls(), options)
    deriv = evaluate_derivatives(problem, theta, s.x, s.u, s.phi)
    c_rel = relax_constraints(problem, s.c_raw, s.mu)
    f = jax.jit(lambda d, n, mu, rl: backward_pass(problem, d, n, mu, rl, options))
    t0 = time.time()
    bw = f(deriv, (c_rel, s.il, s.iu, s.phi, s.zl, s.zu), s.mu, s.reg_last)
    jax.block_until_ready(bw.dL)
    print("backward compile+run:", time.time() - t0, "dL", float(bw.dL), flush=True)
elif which == "fwd":
    from ipddp2tpu import Options
    from ipddp2tpu.backward import backward_pass
    from ipddp2tpu.derivatives import evaluate_derivatives, relax_constraints
    from ipddp2tpu.forward import forward_pass
    from ipddp2tpu.models import concar
    from ipddp2tpu.solve import initialize, _nominal_trial
    options = Options(optimality_tolerance=1e-7, ldlt_unroll=False)
    problem = concar.problem()
    theta, f_lim, tau_lim, x1 = concar.seed1_instance()
    bounds = concar.bounds(f_lim, tau_lim)
    s = initialize(problem, theta, bounds, x1, concar.initial_controls(), options)
    deriv = evaluate_derivatives(problem, theta, s.x, s.u, s.phi)
    c_rel = relax_constraints(problem, s.c_raw, s.mu)
    bw = backward_pass(problem, deriv, (c_rel, s.il, s.iu, s.phi, s.zl, s.zu),
                       s.mu, s.reg_last, options)
    f = jax.jit(lambda s, g, dL: forward_pass(
        problem, theta, bounds, g, _nominal_trial(s), dL, s.mu,
        s.theta_curr, s.L_curr, s.min_primal_1, s.filter_pts, options))
    t0 = time.time()
    r = f(s, bw.gains, bw.dL); jax.block_until_ready(r.step_size)
    print("forward compile+run:", time.time() - t0, flush=True)
