"""Property test: on randomized smooth OCPs, the solver's answer must satisfy
the first-order KKT conditions it claims (independent residual check)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ipddp2tpu import Options, Problem, solve, uniform_bounds

NX, NU, NC, T = 3, 4, 2, 40


def _random_problem(seed):
    ks = jax.random.split(jax.random.PRNGKey(seed), 6)
    A = jnp.eye(NX) + 0.1 * jax.random.normal(ks[0], (NX, NX))
    B = 0.2 * jax.random.normal(ks[1], (NX, NU))
    W = jax.random.normal(ks[2], (NC, NU))
    V = 0.5 * jax.random.normal(ks[3], (NC, NX))
    goal = jax.random.normal(ks[4], (NX,))
    cnl = 0.3 * jax.random.normal(ks[5], (NC,))

    def dynamics(x, u, t, th):
        return A @ x + B @ u + 0.05 * jnp.sin(x)

    def stage_cost(x, u, t, th):
        return 0.05 * jnp.dot(u, u) + 0.01 * jnp.dot(x, x)

    def terminal_cost(x, th):
        d = x - goal
        return 10.0 * jnp.dot(d, d)

    def constraints(x, u, t, th):
        return W @ u + V @ jnp.tanh(x) + cnl * u[0] * u[1]

    return Problem(T=T, nx=NX, nu=NU, nc=NC, dynamics=dynamics,
                   stage_cost=stage_cost, terminal_cost=terminal_cost,
                   constraints=constraints)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_kkt_certificate(seed):
    prob = _random_problem(seed)
    bounds = uniform_bounds(T, -2.0 * jnp.ones(NU), 2.0 * jnp.ones(NU))
    tol = 1e-7
    sol = solve(prob, bounds, jnp.zeros(NX), 0.01 * jnp.ones((T, NU)),
                options=Options(optimality_tolerance=tol,
                                max_iterations=400))
    assert bool(sol.converged), int(sol.status)

    # independent residuals (no solver internals):
    x, u, phi, zl, zu, lam = (np.asarray(sol.x), np.asarray(sol.u),
                              np.asarray(sol.phi), np.asarray(sol.zl),
                              np.asarray(sol.zu), np.asarray(sol.lam))
    for t in [0, T // 2, T - 1]:
        # dynamics feasibility
        np.testing.assert_allclose(
            np.asarray(prob.dynamics(x[t], u[t], t, None)), x[t + 1],
            atol=1e-10)
        # stagewise equality feasibility
        c = np.asarray(prob.constraints(x[t], u[t], t, None))
        assert np.abs(c).max() < 1e-6
        # u-stationarity: lu + cu' phi + fu' lam+ - zl + zu ~ 0
        z = jnp.concatenate([jnp.asarray(x[t]), jnp.asarray(u[t])])
        g = jax.grad(lambda zz: prob.stage_cost(zz[:NX], zz[NX:], t, None))(z)
        cu = jax.jacfwd(lambda uu: prob.constraints(
            jnp.asarray(x[t]), uu, t, None))(jnp.asarray(u[t]))
        fu = jax.jacfwd(lambda uu: prob.dynamics(
            jnp.asarray(x[t]), uu, t, None))(jnp.asarray(u[t]))
        r = (np.asarray(g)[NX:] + np.asarray(cu).T @ phi[t]
             + np.asarray(fu).T @ lam[t + 1] - zl[t] + zu[t])
        assert np.abs(r).max() < 1e-5, (t, np.abs(r).max())
        # complementarity: il*zl ~ mu <= tol
        il = u[t] + 2.0
        iu = 2.0 - u[t]
        assert np.abs(il * zl[t]).max() < 1e-5
        assert np.abs(iu * zu[t]).max() < 1e-5
        # bounds strictly satisfied
        assert il.min() > 0 and iu.min() > 0
