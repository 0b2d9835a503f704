"""Bound-only problems (nc = 0): cartpole swing-up and quadrotor
(BASELINE.json configs). Exercises the solver without equality constraints."""

import jax.numpy as jnp

from ipddp2tpu import Options, solve
from ipddp2tpu.models import cartpole_swingup as cs
from ipddp2tpu.models import quadrotor as qr
import pytest


def test_cartpole_swingup_converges():
    sol = solve(cs.problem(), cs.bounds(), cs.initial_state(),
                cs.initial_controls(),
                options=Options(optimality_tolerance=1e-6,
                                max_iterations=500))
    assert bool(sol.converged), int(sol.status)
    # swing-up reached: pole angle near pi
    assert abs(float(sol.x[-1, 1]) - jnp.pi) < 0.1
    # bound respected
    assert float(jnp.max(jnp.abs(sol.u[:, 0]))) <= cs.FORCE_LIMIT + 1e-8


def test_quadrotor_converges():
    sol = solve(qr.problem(), qr.bounds(), qr.initial_state(),
                qr.initial_controls(),
                options=Options(optimality_tolerance=1e-6,
                                max_iterations=500))
    assert bool(sol.converged), int(sol.status)
    assert float(jnp.linalg.norm(sol.x[-1, :3] - jnp.asarray(qr.GOAL))) < 0.1
    assert float(jnp.min(sol.u)) >= -1e-9


@pytest.mark.slow
def test_quadrotor_batched_instances():
    """BASELINE.json config 'Batched concar/quadrotor: vmapped instances over
    initial states per chip' — batch over randomized goals/starts."""
    import jax

    from ipddp2tpu.batch import batch_stats, solve_batch

    n = 4
    keys = jax.random.split(jax.random.PRNGKey(11), n)
    thetas, x1s = jax.vmap(qr.random_instance)(keys)
    bounds = jax.tree.map(lambda a: jnp.broadcast_to(a, (n,) + a.shape),
                          qr.bounds())
    u0 = jnp.broadcast_to(qr.initial_controls(), (n, qr.T, qr.NU))
    sol = solve_batch(qr.problem(), bounds, x1s, u0, theta=thetas,
                      options=Options(optimality_tolerance=1e-6,
                                      max_iterations=500))
    stats = batch_stats(sol)
    assert int(stats.num_converged) == n
    # each instance lands on its own goal
    import numpy as np
    for i in range(n):
        d = np.linalg.norm(np.asarray(sol.x[i, -1, :3] - thetas.goal[i]))
        assert d < 0.1, (i, d)
