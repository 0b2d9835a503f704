"""Pallas batched LDL^T kernel vs dense NumPy truth (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ipddp2tpu.ops.ldlt_pallas import TILE_B, ldlt_solve_batched_pallas


def _random_kkt_batch(B, nu, nc, rng):
    """IPDDP2-shaped KKT matrices [H, J'; J, 0] with PD H (correct inertia)."""
    m = nu + nc
    K = np.zeros((B, m, m), np.float32)
    for b in range(B):
        H = rng.standard_normal((nu, nu))
        H = (H @ H.T + 0.5 * np.eye(nu)).astype(np.float32)
        J = rng.standard_normal((nc, nu)).astype(np.float32)
        K[b, :nu, :nu] = H
        K[b, :nu, nu:] = J.T
        K[b, nu:, :nu] = J
    return K


@pytest.mark.parametrize("nu,nc,k", [(5, 3, 4), (10, 4, 5)])
def test_pallas_kernel_matches_numpy(nu, nc, k):
    rng = np.random.default_rng(0)
    B = TILE_B
    m = nu + nc
    K = _random_kkt_batch(B, nu, nc, rng)
    rhs = rng.standard_normal((B, m, k)).astype(np.float32)

    X, npos, ok = ldlt_solve_batched_pallas(
        jnp.asarray(K), jnp.asarray(rhs), refine=1, interpret=True)

    assert bool(jnp.all(ok))
    np.testing.assert_array_equal(np.asarray(npos), nu)
    X_np = np.linalg.solve(K.astype(np.float64), rhs.astype(np.float64))
    err = np.abs(np.asarray(X, np.float64) - X_np).max() / (
        np.abs(X_np).max() + 1.0)
    assert err < 5e-5, err     # f32 with one refinement sweep


def test_pallas_kernel_indefinite_inertia():
    rng = np.random.default_rng(3)
    B = TILE_B
    m = 8
    K = rng.standard_normal((B, m, m)).astype(np.float32)
    K = (K + np.transpose(K, (0, 2, 1))) / 2
    rhs = rng.standard_normal((B, m, 2)).astype(np.float32)
    X, npos, ok = ldlt_solve_batched_pallas(
        jnp.asarray(K), jnp.asarray(rhs), refine=1, interpret=True)
    w = np.linalg.eigvalsh(K.astype(np.float64))
    np.testing.assert_array_equal(np.asarray(npos), (w > 0).sum(axis=1))
    assert bool(jnp.all(ok))


def test_pallas_in_solver_f32():
    """Full f32 solve with backward_mode='parallel' + the Pallas KKT kernel
    (interpret mode on CPU) reaches the coarse-tolerance optimum."""
    from ipddp2tpu import Options, solve
    from ipddp2tpu.models import double_integrator as di

    f32 = jnp.float32
    sol = solve(di.problem(), di.bounds(f32),
                di.initial_state(f32), di.initial_controls(f32),
                options=Options(optimality_tolerance=3e-4,
                                backward_mode="parallel",
                                use_pallas_kkt=True, max_iterations=200))
    assert bool(sol.converged), int(sol.status)
    assert abs(float(sol.objective) - di.GOLDEN_OBJECTIVE) < 1e-2
