"""Reference-style facade: construction from per-stage lists, solve,
get_trajectory (reference exports, src/InteriorPointDDP.jl:29-45)."""

import jax.numpy as jnp
import numpy as np

from ipddp2tpu import (Bound, Constraint, Dynamics, Objective, Options,
                       Solver, get_trajectory)


def test_facade_double_integrator():
    T, dt = 100, 0.01
    f = lambda x, u: x + dt * jnp.array([x[1], u[0]])
    dyn = Dynamics(f, 2, 3)
    stage = Objective(lambda x, u: dt * (u[1] + u[2]), 2, 3)
    term = Objective(
        lambda x, u: 500.0 * jnp.sum((x - jnp.array([1.0, 0.0])) ** 2), 2, 0)
    con = Constraint(lambda x, u: jnp.array([u[1] - u[2] - u[0] * x[1]]),
                     2, 3)
    bound = Bound(np.array([-10.0, 0.0, 0.0]),
                  np.array([10.0, np.inf, np.inf]))

    solver = Solver([dyn] * T, [stage] * T + [term],
                    [con] * T + [Constraint(2, 0)],
                    [bound] * T + [Bound(0)],
                    options=Options(optimality_tolerance=1e-7))
    # reference-style list-of-vectors initial controls with empty terminal
    u_init = [np.full(3, 0.01) for _ in range(T)] + [np.zeros(0)]
    sol = solver.solve(np.zeros(2), u_init)
    assert bool(sol.converged)
    np.testing.assert_allclose(float(sol.objective), 1.26574863, rtol=1e-6)
    assert int(sol.iterations) == 31
    x, u = get_trajectory(solver)
    assert x.shape == (T + 1, 2) and u.shape == (T, 3)
    assert solver.wall_time > 0


def test_uniform_facade_lowers_without_switch():
    """Uniform per-stage lists must dedupe to a direct call, not a T-branch
    lax.switch (wrapper closures are fresh per stage; dedupe is on the
    underlying (user_fn, dims) keys)."""
    import jax

    T, dt = 8, 0.01
    f = lambda x, u: x + dt * jnp.array([x[1], u[0]])
    dyn = Dynamics(f, 2, 3)
    stage = Objective(lambda x, u: dt * (u[1] + u[2]), 2, 3)
    term = Objective(lambda x, u: jnp.sum(x ** 2), 2, 0)
    con = Constraint(lambda x, u: jnp.array([u[1] - u[2] - u[0] * x[1]]),
                     2, 3)
    solver = Solver([dyn] * T, [stage] * T + [term],
                    [con] * T + [Constraint(2, 0)])
    x, u = jnp.zeros(2), jnp.zeros(3)
    for fn in (solver.problem.dynamics, solver.problem.stage_cost,
               solver.problem.constraints):
        jaxpr = str(jax.make_jaxpr(lambda x, u: fn(x, u, 3, None))(x, u))
        assert "cond" not in jaxpr and "switch" not in jaxpr
