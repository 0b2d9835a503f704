"""Time-parallel (associative-scan) backward pass vs the sequential recursion.

The parallel value scan must reproduce the sequential Riccati values exactly
(same condensation, different evaluation order)."""

import jax
import jax.numpy as jnp
import numpy as np

from ipddp2tpu.derivatives import evaluate_derivatives, relax_constraints
from ipddp2tpu.models import concar, double_integrator as di
from ipddp2tpu.options import Options
from ipddp2tpu.parallel.priccati import (_stage_blocks, costate_scan,
                                         parallel_value_scan)
from ipddp2tpu.solve import initialize
import pytest


def _sequential_values(problem, deriv, nominal, mu, lam, reg=0.0, delta_c=0.0):
    """Direct transliteration of the sequential value recursion
    (the same equations as backward._run_pass)."""
    nx, nu, nc, T = problem.nx, problem.nu, problem.nc, problem.T
    c_rel, il, iu, phi, zl, zu = nominal
    Vx = np.asarray(deriv.lTx)
    Vxx = np.asarray(deriv.lTxx)
    out_Vx = np.zeros((T, nx))
    out_Vxx = np.zeros((T, nx, nx))
    for t in range(T - 1, -1, -1):
        out_Vx[t] = Vx          # V_{t+1} seen by stage t
        out_Vxx[t] = Vxx
        fx, fu = np.asarray(deriv.fx[t]), np.asarray(deriv.fu[t])
        cx, cu = np.asarray(deriv.cx[t]), np.asarray(deriv.cu[t])
        fH = np.asarray(deriv.fH[t])
        cH = np.asarray(deriv.cH_phi[t])
        sl = 1.0 / np.asarray(il[t])
        su = 1.0 / np.asarray(iu[t])
        sig = np.asarray(zl[t]) * sl + np.asarray(zu[t]) * su
        lam_n = np.asarray(lam[t + 1])
        fHl = np.einsum("i,ijk->jk", lam_n, fH)
        second = fHl + cH
        Qu = (np.asarray(deriv.lu[t]) + cu.T @ np.asarray(phi[t])
              + fu.T @ Vx - mu * sl + mu * su)
        C = np.asarray(deriv.lxx[t]) + fx.T @ Vxx @ fx + second[:nx, :nx]
        H = (np.asarray(deriv.luu[t]) + np.diag(sig) + fu.T @ Vxx @ fu
             + second[nx:, nx:] + reg * np.eye(nu))
        B = np.asarray(deriv.lux[t]) + fu.T @ Vxx @ fx + second[nx:, :nx]
        m = nu + nc
        K = np.zeros((m, m))
        K[:nu, :nu] = H
        K[:nu, nu:] = cu.T
        K[nu:, :nu] = cu
        K[nu:, nu:] = -delta_c * np.eye(nc)
        rhs = np.zeros((m, nx + 1))
        rhs[:nu, 0] = -Qu
        rhs[:nu, 1:] = -B
        rhs[nu:, 0] = -np.asarray(c_rel[t])
        rhs[nu:, 1:] = -cx
        X = np.linalg.solve(K, rhs)
        alpha, beta = X[:nu, 0], X[:nu, 1:]
        omega = X[nu:, 1:]
        psi = X[nu:, 0]
        Vxx_new = C + beta.T @ B + omega.T @ cx
        Vxx_new = 0.5 * (Vxx_new + Vxx_new.T)
        Vx_new = (np.asarray(deriv.lx[t]) + cx.T @ np.asarray(phi[t])
                  + beta.T @ Qu + omega.T @ np.asarray(c_rel[t]) + fx.T @ Vx)
        Vx, Vxx = Vx_new, Vxx_new
    return out_Vx, out_Vxx


def _setup(module, theta, bounds, x1, u0):
    options = Options(optimality_tolerance=1e-7)
    prob = module.problem()
    s = initialize(prob, theta, bounds, x1, u0, options)
    deriv = evaluate_derivatives(prob, theta, s.x, s.u, s.phi,
                                 with_dynamics_hessian=True)
    c_rel = relax_constraints(prob, s.c_raw, s.mu)
    nominal = (c_rel, s.il, s.iu, s.phi, s.zl, s.zu)
    return prob, deriv, nominal, s, options


def _check(module, theta, bounds, x1, u0, rtol=1e-8, perturb=False):
    prob, deriv, nominal, s, options = _setup(module, theta, bounds, x1, u0)
    if perturb:
        # break near-commutativity of the stage maps: random duals and a
        # perturbed trajectory so every fx, r_x differs across stages
        key = jax.random.PRNGKey(42)
        ks = jax.random.split(key, 3)
        s = s._replace(
            phi=0.5 * jax.random.normal(ks[0], s.phi.shape),
            zl=s.zl + 0.3 * jax.random.uniform(ks[1], s.zl.shape) * s.zl,
            u=s.u + 0.05 * jax.random.normal(ks[2], s.u.shape))
        xs = [s.x[0]]
        for t in range(prob.T):
            xs.append(prob.dynamics(xs[t], s.u[t], t, theta))
        x = jnp.stack(xs)
        il = s.u - bounds.lower
        iu = bounds.upper - s.u
        s = s._replace(x=x, il=il, iu=iu)
        deriv = evaluate_derivatives(prob, theta, s.x, s.u, s.phi,
                                     with_dynamics_hessian=True)
        c_raw = jax.vmap(lambda xt, ut, t: prob.eval_constraints(
            xt, ut, t, theta))(s.x[:prob.T], s.u, jnp.arange(prob.T))
        c_rel = relax_constraints(prob, c_raw, s.mu)
        nominal = (c_rel, s.il, s.iu, s.phi, s.zl, s.zu)
    lam = costate_scan(deriv, s.phi)

    # sequential truth
    Vx_seq, Vxx_seq = _sequential_values(prob, deriv, nominal,
                                         float(s.mu), np.asarray(lam))
    # parallel scan
    second = deriv.cH_phi + jnp.einsum("ti,tijk->tjk", lam[1:], deriv.fH)
    elems = _stage_blocks(prob, deriv, nominal, s.mu, second,
                          jnp.zeros(()), jnp.zeros(()), options)
    Vx_par, Vxx_par = parallel_value_scan(prob, elems, deriv.lTx, deriv.lTxx)

    # costate check against the sequential formula
    lam_seq = np.zeros((prob.T + 1, prob.nx))
    lam_seq[prob.T] = np.asarray(deriv.lTx)
    for t in range(prob.T - 1, -1, -1):
        r_x = (np.asarray(deriv.lx[t])
               + np.asarray(deriv.cx[t]).T @ np.asarray(s.phi[t]))
        lam_seq[t] = r_x + np.asarray(deriv.fx[t]).T @ lam_seq[t + 1]
    np.testing.assert_allclose(np.asarray(lam), lam_seq, rtol=1e-10,
                               atol=1e-10)

    scale = np.abs(Vxx_seq).max()
    np.testing.assert_allclose(np.asarray(Vxx_par), Vxx_seq,
                               rtol=rtol, atol=rtol * scale)
    np.testing.assert_allclose(np.asarray(Vx_par), Vx_seq,
                               rtol=rtol, atol=rtol * np.abs(Vx_seq).max())


def test_parallel_matches_sequential_double_integrator():
    _check(di, None, di.bounds(), di.initial_state(), di.initial_controls())


@pytest.mark.slow
def test_parallel_matches_sequential_concar():
    theta, f_lim, tau_lim, x1 = concar.seed1_instance()
    _check(concar, theta, concar.bounds(f_lim, tau_lim), x1,
           concar.initial_controls())


def test_parallel_matches_sequential_noncommuting():
    """Randomized duals/trajectory: stage maps genuinely differ, so any
    composition-order error in the scans is caught (the uniform initial state
    nearly commutes and can mask it)."""
    theta, f_lim, tau_lim, x1 = concar.seed1_instance()
    _check(concar, theta, concar.bounds(f_lim, tau_lim), x1,
           concar.initial_controls(), rtol=1e-7, perturb=True)


def test_full_solve_parallel_backward():
    """End-to-end solve with backward_mode='parallel' reproduces the golden
    double integrator result."""
    from ipddp2tpu import Options as O, solve

    sol = solve(di.problem(), di.bounds(), di.initial_state(),
                di.initial_controls(),
                options=O(optimality_tolerance=1e-7,
                          backward_mode="parallel"))
    assert bool(sol.converged), int(sol.status)
    np.testing.assert_allclose(float(sol.objective), di.GOLDEN_OBJECTIVE,
                               rtol=1e-6)
    assert abs(int(sol.iterations) - di.GOLDEN_ITERATIONS) <= 3


def test_full_solve_parallel_backward_concar():
    from ipddp2tpu import Options as O, solve

    theta, f_lim, tau_lim, x1 = concar.seed1_instance()
    sol = solve(concar.problem(), concar.bounds(f_lim, tau_lim), x1,
                concar.initial_controls(), theta=theta,
                options=O(optimality_tolerance=1e-7,
                          backward_mode="parallel"))
    assert bool(sol.converged), int(sol.status)
    np.testing.assert_allclose(float(sol.objective),
                               concar.SEED1_GOLDEN_OBJECTIVE, rtol=1e-6)


def test_parallel_backward_no_constraints():
    """nc = 0 edge of the parallel mode (bound-only cartpole swing-up),
    combined with the speculative line search."""
    from ipddp2tpu import Options as O, solve
    from ipddp2tpu.models import cartpole_swingup as cs

    sol = solve(cs.problem(), cs.bounds(), cs.initial_state(),
                cs.initial_controls(),
                options=O(optimality_tolerance=1e-6, max_iterations=500,
                          backward_mode="parallel", ls_speculative=24))
    assert bool(sol.converged), int(sol.status)
    assert abs(float(sol.x[-1, 1]) - jnp.pi) < 0.1
