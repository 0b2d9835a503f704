"""Chunked execution must reproduce the single-program solve exactly."""

import jax
import jax.numpy as jnp
import numpy as np

from ipddp2tpu import Options, solve
from ipddp2tpu.chunked import solve_chunked
from ipddp2tpu.models import concar, double_integrator as di


def test_chunked_matches_single():
    opts = Options(optimality_tolerance=1e-7)
    a = solve(di.problem(), di.bounds(), di.initial_state(),
              di.initial_controls(), options=opts)
    b = solve_chunked(di.problem(), di.bounds(), di.initial_state(),
                      di.initial_controls(), options=opts, chunk=7)
    assert bool(b.converged)
    assert int(a.iterations) == int(b.iterations)
    np.testing.assert_allclose(float(a.objective), float(b.objective),
                               rtol=1e-12)


def test_chunked_batched():
    opts = Options(optimality_tolerance=1e-6, max_iterations=600)
    n = 3
    keys = jax.random.split(jax.random.PRNGKey(5), n)
    thetas, f_lims, tau_lims, x1s = jax.vmap(concar.random_instance)(keys)
    bounds = concar.bounds(f_lims, tau_lims)
    u0 = jnp.broadcast_to(concar.initial_controls(),
                          (n, concar.T, concar.NU))
    sol = solve_chunked(concar.problem(), bounds, x1s, u0, theta=thetas,
                        options=opts, chunk=40, batched=True)
    assert int(jnp.sum(sol.converged)) == n, np.asarray(sol.status)
