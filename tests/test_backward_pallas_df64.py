"""Parity of the df64 (double-single) endgame megakernel vs the f64 scan.

The df64 kernel (`ops/backward_pallas_df64.py`) must reproduce the f64 scan
backward pass to ~df64 precision (unit roundoff 2^-48): gains, expected
decrease, restart bookkeeping — on randomized inputs including randomized
duals (CLAUDE.md numerical lessons), at an ENDGAME-like barrier (mu = 1e-8,
graded Sigma) where f32 would be hopeless.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ipddp2tpu import Options
from test_backward_pallas import random_inputs, run_backward, tiny_problem


# nc=2's random KKT systems are well-conditioned -> df64 holds ~2^-48;
# nc=0 leaves H unregularized (reg=0) and condition-number amplification of
# the 2^-48 roundoff reaches ~1e-10 absolute (an f32-precision leak would
# show at >= 1e-5 under the same conditioning, so the bound still bites).
@pytest.mark.parametrize("nc,rtol,atol", [(2, 3e-13, 1e-13),
                                          (0, 1e-7, 1e-9)])
@pytest.mark.kernels
def test_df64_matches_f64_scan(nc, rtol, atol):
    problem = tiny_problem(nc=nc)
    inputs = random_inputs(problem, jax.random.PRNGKey(0), 4, jnp.float64)
    ref = run_backward(problem, inputs, 0.1, Options(backward_kernel="xla"))
    out = run_backward(problem, inputs, 0.1,
                       Options(backward_kernel="pallas_df64"))
    for a, b, name in zip(ref.gains, out.gains, ref.gains._fields):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=rtol, atol=atol, err_msg=name)
    np.testing.assert_allclose(np.asarray(out.dL), np.asarray(ref.dL),
                               rtol=rtol, atol=atol)
    np.testing.assert_array_equal(np.asarray(out.status),
                                  np.asarray(ref.status))
    np.testing.assert_allclose(np.asarray(out.reg), np.asarray(ref.reg))


def test_df64_endgame_graded_sigma():
    """mu = 1e-8 with tiny slacks -> Sigma ~ 1e8-1e10 rows: the regime the
    endgame actually solves. df64 must stay within ~1e-10 of the f64 scan
    where plain f32 diverges by orders of magnitude."""
    problem = tiny_problem(nc=2)
    x, u, phi, il, iu, zl, zu, c = random_inputs(
        problem, jax.random.PRNGKey(3), 4, jnp.float64)
    # endgame slacks: il ~ mu / zl with zl ~ O(1)
    il = 1e-8 + 1e-9 * il
    iu = 0.5 + iu
    inputs = (x, u, phi, il, iu, zl, zu, c)
    mu = 1e-8
    ref = run_backward(problem, inputs, mu, Options(backward_kernel="xla"))
    out = run_backward(problem, inputs, mu,
                       Options(backward_kernel="pallas_df64"))
    np.testing.assert_array_equal(np.asarray(out.status),
                                  np.asarray(ref.status))
    for a, b, name in zip(ref.gains, out.gains, ref.gains._fields):
        aa, bb = np.asarray(a), np.asarray(b)
        scale = np.maximum(np.abs(aa).max(), 1.0)
        np.testing.assert_allclose(bb / scale, aa / scale, atol=2e-10,
                                   err_msg=name)


def test_df64_restart_ladder_parity():
    problem = tiny_problem(nc=2)

    def bad_cost(x, u, t, theta):
        return jnp.sum(x**2) - 0.8 * jnp.sum(u**2) + 0.01 * x[0] * u[1]

    problem = dataclasses.replace(problem, stage_cost=bad_cost)
    inputs = random_inputs(problem, jax.random.PRNGKey(1), 4, jnp.float64)
    ref = run_backward(problem, inputs, 0.1, Options(backward_kernel="xla"))
    out = run_backward(problem, inputs, 0.1,
                       Options(backward_kernel="pallas_df64"))
    assert np.any(np.asarray(ref.reg) > 0)
    np.testing.assert_allclose(np.asarray(out.reg), np.asarray(ref.reg))
    np.testing.assert_array_equal(np.asarray(out.status),
                                  np.asarray(ref.status))


def test_df64_in_solver_endgame():
    """Mixed solve with the df64 kernel forced in phase 2 hits the golden
    double_integrator anchor to full tolerance."""
    from ipddp2tpu import Bounds
    from ipddp2tpu.batch import solve_batch
    from ipddp2tpu.models import double_integrator as di

    problem = di.problem()
    batch = 2
    x1 = jnp.broadcast_to(di.initial_state(), (batch, problem.nx))
    u0 = jnp.broadcast_to(di.initial_controls(),
                          (batch, problem.T, problem.nu))
    bounds = di.bounds()
    bb = Bounds(jnp.broadcast_to(bounds.lower, (batch,) + bounds.lower.shape),
                jnp.broadcast_to(bounds.upper, (batch,) + bounds.upper.shape))
    sol = solve_batch(problem, bb, x1, u0,
                      options=Options(optimality_tolerance=1e-7,
                                      backward_kernel="pallas_df64"))
    assert bool(np.asarray(sol.converged).all())
    np.testing.assert_allclose(np.asarray(sol.objective), 1.26574863,
                               rtol=1e-6)
    assert (np.asarray(sol.iterations) == 31).all()
