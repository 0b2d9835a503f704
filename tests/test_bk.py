"""Bunch-Kaufman rook oracle (ops/bk.py): factorization, inertia, solve.

The BK path is the reference-faithful inertia diagnostic
(reference: src/inertia_correction.jl:54-205, :257-276); these tests pin
(a) reconstruction P L D L' P^T = A, (b) inertia vs eigh sign counts,
(c) solve accuracy, and (d) golden solver parity under inertia_method="bk".
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ipddp2tpu.ops.bk import bk_factor_rook, bk_inertia, bk_solve


def _reconstruct(f):
    m = f.d.shape[0]
    D = np.diag(np.asarray(f.d))
    e = np.asarray(f.e)
    for k in range(m - 1):
        if e[k] != 0.0:
            D[k + 1, k] = D[k, k + 1] = e[k]
    L = np.asarray(f.L)
    P = np.eye(m)[np.asarray(f.perm)]
    return P.T @ L @ D @ L.T @ P


def _random_sym(key, m, kind):
    A = jax.random.normal(key, (m, m), dtype=jnp.float64)
    A = 0.5 * (A + A.T)
    if kind == "indef_graded":
        # graded like late-iteration KKTs: huge Sigma block + small coupling
        s = 10.0 ** jnp.linspace(0, 8, m)
        A = A * jnp.outer(jnp.sqrt(s), jnp.sqrt(s))
    elif kind == "near_singular":
        w, V = jnp.linalg.eigh(A)
        w = w.at[0].set(1e-14)
        A = (V * w) @ V.T
        A = 0.5 * (A + A.T)
    return A


@pytest.mark.parametrize("kind", ["plain", "indef_graded", "near_singular"])
@pytest.mark.parametrize("m", [3, 10, 35])
def test_bk_reconstruction_and_inertia(kind, m):
    # deterministic seed (hash() is PYTHONHASHSEED-randomized => flaky)
    base = {"plain": 0, "indef_graded": 1, "near_singular": 2}[kind]
    keys = jax.random.split(jax.random.PRNGKey(1000 * base + m), 20)
    for key in keys:
        A = _random_sym(key, m, kind)
        f = bk_factor_rook(A)
        R = _reconstruct(f)
        An = np.asarray(A)
        scale = max(1.0, float(np.abs(An).max()))
        np.testing.assert_allclose(R, An, atol=5e-9 * scale)

        npos, nneg, nzero = (int(x) for x in bk_inertia(f, atol=1e-12))
        w = np.linalg.eigvalsh(An)
        # eigh reference counts, bracketed: an eigenvalue within one decade
        # of the zero tolerance is genuinely ambiguous (BK's pivot-based
        # classification and eigh's threshold may legitimately differ on
        # it), so require the BK counts to land between the strict and the
        # lenient eigh counts rather than match one knife-edge cutoff.
        ztol = 1e-10 * scale
        if kind != "near_singular":
            assert int((w > 10 * ztol).sum()) <= npos <= int(
                (w > 0.1 * ztol).sum())
            assert int((w < -10 * ztol).sum()) <= nneg <= int(
                (w < -0.1 * ztol).sum())
        assert npos + nneg + nzero == m


def test_bk_solve_accuracy():
    keys = jax.random.split(jax.random.PRNGKey(7), 10)
    for key in keys:
        A = _random_sym(key, 20, "indef_graded")
        rhs = jax.random.normal(jax.random.fold_in(key, 1), (20, 5),
                                dtype=jnp.float64)
        X = bk_solve(bk_factor_rook(A), rhs)
        r = np.asarray(A @ X - rhs)
        assert np.abs(r).max() <= 1e-6 * float(np.abs(np.asarray(rhs)).max())


def test_bk_detects_zero_pivot():
    A = jnp.zeros((4, 4), jnp.float64)
    f = bk_factor_rook(A)
    assert int(f.info) > 0


def test_golden_double_integrator_under_bk():
    """inertia_method='bk' must reproduce the golden anchor exactly
    (reference: experiments/ipddp2/results/double_integrator.txt:2)."""
    from ipddp2tpu import Options, solve
    from ipddp2tpu.models import double_integrator as di

    options = Options(optimality_tolerance=1e-7, inertia_method="bk")
    result = solve(di.problem(), di.bounds(), di.initial_state(),
                   di.initial_controls(), options=options)
    assert bool(result.converged)
    np.testing.assert_allclose(float(result.objective), 1.26574863,
                               rtol=1e-8)
    assert int(result.iterations) == 31
