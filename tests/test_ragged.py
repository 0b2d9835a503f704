"""Per-stage varying control/constraint dimensions (reference README:19)
through the facade's padding lift."""

import jax.numpy as jnp
import numpy as np

from ipddp2tpu import (Bound, Constraint, Dynamics, Objective, Options,
                       Solver)


def test_ragged_control_dims():
    """Double integrator where only the first half of the horizon carries the
    work-slack machinery (3 controls); the second half is plain force (1
    control, no constraint). The padded solve must still certify KKT."""
    T, dt = 60, 0.01
    goal = jnp.array([1.0, 0.0])

    f3 = lambda x, u: x + dt * jnp.array([x[1], u[0]])
    f1 = lambda x, u: x + dt * jnp.array([x[1], u[0]])
    dyn = ([Dynamics(f3, 2, 3)] * (T // 2)
           + [Dynamics(f1, 2, 1)] * (T - T // 2))

    stage3 = Objective(lambda x, u: dt * (u[1] + u[2]), 2, 3)
    stage1 = Objective(lambda x, u: dt * u[0] ** 2, 2, 1)
    term = Objective(lambda x, u: 500.0 * jnp.sum((x - goal) ** 2), 2, 0)
    objs = [stage3] * (T // 2) + [stage1] * (T - T // 2) + [term]

    con3 = Constraint(lambda x, u: jnp.array([u[1] - u[2] - u[0] * x[1]]),
                      2, 3)
    cons = [con3] * (T // 2) + [Constraint(2, 1)] * (T - T // 2) \
        + [Constraint(2, 0)]

    b3 = Bound(np.array([-10.0, 0.0, 0.0]), np.array([10.0, np.inf, np.inf]))
    b1 = Bound(np.array([-10.0]), np.array([10.0]))
    bounds = [b3] * (T // 2) + [b1] * (T - T // 2) + [Bound(0)]

    solver = Solver(dyn, objs, cons, bounds,
                    options=Options(optimality_tolerance=1e-7,
                                    max_iterations=400))
    u_init = ([np.full(3, 0.01)] * (T // 2)
              + [np.full(1, 0.01)] * (T - T // 2) + [np.zeros(0)])
    sol = solver.solve(np.zeros(2), u_init)
    assert bool(sol.converged), int(sol.status)
    assert float(sol.primal_inf) < 1e-7
    # padded controls sit at ~0 in the second half
    u = np.asarray(sol.u)
    assert np.abs(u[T // 2:, 1:]).max() < 1e-6
    # moves toward the goal (the 0.6 s horizon cannot fully reach it)
    assert float(sol.x[-1, 0]) > 0.7


def test_ragged_state_dims():
    """Per-stage STATE dims may vary (reference README.md:19): a scalar
    integrator phase that hands off to a 2-state double-integrator phase.
    The facade's zero-padding lift must match the hand-padded uniform
    formulation exactly (same objective, same iteration count)."""
    T, T1, dt = 40, 20, 0.05
    goal = jnp.array([1.0, 0.0])

    # ragged formulation: nx=1 for t < T1, nx=2 after
    f1 = lambda x, u: x + dt * u                        # 1 -> 1
    fh = lambda x, u: jnp.array([x[0] + dt * u[0], 0.0])  # 1 -> 2 handoff
    f2 = lambda x, u: jnp.array([x[0] + dt * x[1], x[1] + dt * u[0]])
    dyn = ([Dynamics(f1, 1, 1)] * (T1 - 1) + [Dynamics(fh, 1, 1)]
           + [Dynamics(f2, 2, 1)] * (T - T1))
    stage = Objective(lambda x, u: dt * jnp.dot(u, u), 1, 1)
    stage2 = Objective(lambda x, u: dt * jnp.dot(u, u), 2, 1)
    term = Objective(lambda x, u: 300.0 * jnp.sum((x - goal) ** 2), 2, 0)
    objs = [stage] * T1 + [stage2] * (T - T1) + [term]
    b = Bound(np.array([-5.0]), np.array([5.0]))
    bounds = [b] * T + [Bound(0)]

    solver = Solver(dyn, objs, None, bounds,
                    options=Options(optimality_tolerance=1e-7))
    u_init = [np.full(1, 0.01)] * T + [np.zeros(0)]
    sol = solver.solve(np.zeros(1), u_init)
    assert bool(sol.converged), int(sol.status)

    # hand-padded uniform formulation (nx=2 everywhere, slot 1 frozen at 0
    # during phase 1) must be the same optimization problem
    g1 = lambda x, u: jnp.array([x[0] + dt * u[0], 0.0])
    dyn_u = ([Dynamics(g1, 2, 1)] * T1 + [Dynamics(f2, 2, 1)] * (T - T1))
    objs_u = [stage2] * T + [term]
    solver_u = Solver(dyn_u, objs_u, None, bounds,
                      options=Options(optimality_tolerance=1e-7))
    sol_u = solver_u.solve(np.zeros(2), u_init)
    assert bool(sol_u.converged)
    np.testing.assert_allclose(float(sol.objective), float(sol_u.objective),
                               rtol=1e-9)
    assert int(sol.iterations) == int(sol_u.iterations)

    # get_trajectory trims ragged states to per-stage dims
    from ipddp2tpu import get_trajectory
    x, u = get_trajectory(solver)
    assert isinstance(x, list) and x[0].shape == (1,) and x[-1].shape == (2,)
