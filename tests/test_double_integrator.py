"""Golden regression: double_integrator must reproduce the reference result.

The reference solves this deterministic problem to objective 1.26574863e+00 in
31 iterations at tol 1e-7 (reference:
experiments/ipddp2/results/double_integrator.txt:2) — the exact anchor
SURVEY.md §4 designates for the minimum end-to-end slice.
"""

import jax
import jax.numpy as jnp
import numpy as np

from ipddp2tpu import Options, solve
from ipddp2tpu.models import double_integrator as di


def test_golden():
    options = Options(optimality_tolerance=1e-7)
    sol = solve(di.problem(), di.bounds(), di.initial_state(),
                di.initial_controls(), options=options)
    assert bool(sol.converged), f"status={int(sol.status)}"
    np.testing.assert_allclose(float(sol.objective), di.GOLDEN_OBJECTIVE,
                               rtol=1e-6)
    assert float(sol.primal_inf) < 1e-7
    iters = int(sol.iterations)
    assert abs(iters - di.GOLDEN_ITERATIONS) <= max(
        3, int(0.1 * di.GOLDEN_ITERATIONS) + 1), iters


def test_jit_solve():
    options = Options(optimality_tolerance=1e-7)
    jsolve = jax.jit(solve, static_argnames=("problem", "options"))
    sol = jsolve(di.problem(), di.bounds(), di.initial_state(),
                 di.initial_controls(), options=options)
    assert bool(sol.converged)
    np.testing.assert_allclose(float(sol.objective), di.GOLDEN_OBJECTIVE,
                               rtol=1e-6)
