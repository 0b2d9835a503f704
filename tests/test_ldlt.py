"""Unit tests for the LDL^T + inertia op against dense eigendecomposition
(the test strategy SURVEY.md §4 prescribes for the flagship kernel)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ipddp2tpu.ops.ldlt import (ldlt_factor, ldlt_solve, ldlt_solve_refined)


def random_sym(rng, m):
    A = rng.standard_normal((m, m))
    return (A + A.T) / 2


@pytest.mark.parametrize("m", [1, 2, 3, 5, 8, 13, 21, 35])
def test_inertia_matches_eigh(m):
    rng = np.random.default_rng(m)
    factor = jax.jit(ldlt_factor)
    for trial in range(8):
        A = random_sym(rng, m)
        f = factor(jnp.asarray(A))
        w = np.linalg.eigvalsh(A)
        assert bool(f.ok), "random symmetric matrices should factor"
        assert int(f.n_pos) == int(np.sum(w > 0))
        assert int(f.n_zero) == 0


@pytest.mark.parametrize("m", [2, 5, 12, 35])
def test_solve_accuracy(m):
    rng = np.random.default_rng(100 + m)
    A = random_sym(rng, m) + 0.0
    b = rng.standard_normal((m, 4))
    f = ldlt_factor(jnp.asarray(A))
    x = ldlt_solve(f, jnp.asarray(b))
    np.testing.assert_allclose(A @ np.asarray(x), b, atol=1e-9)


def test_kkt_saddle_point_inertia():
    """IPDDP2-shaped KKT: [H, J'; J, 0] with H PD has inertia (nu, nc, 0)."""
    rng = np.random.default_rng(7)
    nu, nc = 6, 3
    H = random_sym(rng, nu)
    H = H @ H.T + 0.1 * np.eye(nu)     # PD
    J = rng.standard_normal((nc, nu))
    K = np.zeros((nu + nc, nu + nc))
    K[:nu, :nu] = H
    K[:nu, nu:] = J.T
    K[nu:, :nu] = J
    f = ldlt_factor(jnp.asarray(K))
    assert bool(f.ok)
    assert int(f.n_pos) == nu
    assert int(f.n_zero) == 0


def test_singular_detected():
    A = jnp.asarray(np.diag([1.0, 0.0, -2.0]))
    f = ldlt_factor(A)
    assert not bool(f.ok)
    assert int(f.n_zero) == 1


def test_refinement_improves_illconditioned():
    rng = np.random.default_rng(3)
    m = 20
    Q, _ = np.linalg.qr(rng.standard_normal((m, m)))
    w = np.logspace(-8, 0, m) * np.sign(rng.standard_normal(m))
    A = (Q * w) @ Q.T
    b = rng.standard_normal(m)
    f = ldlt_factor(jnp.asarray(A))
    x0 = ldlt_solve(f, jnp.asarray(b))
    x1 = ldlt_solve_refined(f, jnp.asarray(A), jnp.asarray(b),
                            refine_steps=2)
    r0 = np.linalg.norm(A @ np.asarray(x0) - b)
    r1 = np.linalg.norm(A @ np.asarray(x1) - b)
    # both are at the noise floor for cond(A) ~ 1e8; refinement must not
    # degrade the solution and must stay near machine-precision residual
    assert r1 <= max(2.0 * r0, 1e-7)
    assert r1 <= 1e-6 * np.linalg.norm(b)


def test_vmap_batch():
    rng = np.random.default_rng(11)
    B, m = 64, 9
    A = rng.standard_normal((B, m, m))
    A = (A + np.swapaxes(A, 1, 2)) / 2
    fs = jax.vmap(ldlt_factor)(jnp.asarray(A))
    w = np.linalg.eigvalsh(A)
    np.testing.assert_array_equal(np.asarray(fs.n_pos), np.sum(w > 0, axis=1))


def test_empty_matrix():
    f = ldlt_factor(jnp.zeros((0, 0)))
    assert bool(f.ok)
    x = ldlt_solve(f, jnp.zeros((0, 3)))
    assert x.shape == (0, 3)
