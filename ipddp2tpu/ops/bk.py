"""Bunch-Kaufman rook factorization with LAPACK-faithful inertia counting.

The reference's inertia correction factors each stage KKT matrix with
LAPACK's `sytrf_rook` and counts eigenvalue signs of the block-diagonal D
with a tolerance-aware rule over 1x1 and 2x2 blocks (reference:
src/inertia_correction.jl:54-205, :257-276). The framework's default paths
(diagonal-pivoted LDL^T with a residual gate; eigh oracle) certify the same
solves but make *different reg-ladder decisions* on matrices whose inertia
is tolerance-ambiguous — the surviving hypothesis for pushing_1_obs's
systematically different (but equally certified) local optima
(experiments/RESULTS.md). `inertia_method="bk"` runs THIS algorithm instead:
rook-pivoted Bunch-Kaufman with the reference's exact counting rules and
ladder semantics (np == num_controls AND info == 0; delta_c on info > 0),
closing that gap as a diagnostic.

Fidelity notes:
  * LAPACK is called with uplo='U' in the reference (factors from the last
    row up); this is the 'L' variant (first row down) — the same algorithm
    mirrored, with the same alpha = (1+sqrt(17))/8 tests and rook loop.
    Bitwise parity with a given LAPACK build is not attainable from JAX
    anyway; what is replicated is the decision STRUCTURE.
  * Solve is plain substitution on P L D L' P^T with no iterative refinement
    and no residual gate (the reference's ldiv!), unlike `ops/ldlt.py`.
  * Pure JAX with masked full-matrix updates (m <= ~40); a vmapped
    diagnostic path, not a Pallas hot kernel.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

Array = jax.Array

_ALPHA = (1.0 + 17.0 ** 0.5) / 8.0


class BKFactors(NamedTuple):
    L: Array        # [m, m] unit-lower factor (strict lower part used)
    d: Array        # [m] D diagonal
    e: Array        # [m] D subdiagonal (e[k] != 0 marks a 2x2 block at k)
    perm: Array     # [m] i32: row/col permutation applied (A_perm = A[p][:, p])
    info: Array     # i32: 0 ok, k+1 if the k-th pivot is exactly zero


def _sym_swap(A, i, j):
    """Symmetric row+column interchange (full matrix; i, j traced)."""
    ri, rj = A[i, :], A[j, :]
    A = A.at[i, :].set(rj).at[j, :].set(ri)
    ci, cj = A[:, i], A[:, j]
    return A.at[:, i].set(cj).at[:, j].set(ci)


def bk_factor_rook(A: Array) -> BKFactors:
    """Rook-pivoted Bunch-Kaufman factorization of a symmetric [m, m]."""
    m = A.shape[-1]
    dtype = A.dtype
    idx = jnp.arange(m)

    def col_abs_below(A, k):
        """|A[i, k]| for i > k, -inf elsewhere."""
        v = jnp.abs(A[:, k])
        return jnp.where(idx > k, v, -jnp.inf)

    def row_abs_active(A, r, k):
        """|A[r, j]| for j in [k, m), j != r (symmetric full storage:
        the active-block row/col of r), -inf elsewhere."""
        v = jnp.abs(A[r, :])
        return jnp.where((idx >= k) & (idx != r), v, -jnp.inf)

    def rook_loop(A, k, imax, colmax):
        """LAPACK dsytrf_rook pivot search. Returns (kp, p, kstep)."""

        def cond(c):
            return ~c[3]

        def body(c):
            p, imax, colmax, done, kp, kstep = c
            rowv = row_abs_active(A, imax, k)
            jmax = jnp.argmax(rowv)
            rowmax = rowv[jmax]
            aii = jnp.abs(A[imax, imax])
            take1 = aii >= _ALPHA * rowmax
            take2 = (~take1) & ((p == jmax) | (rowmax <= colmax))
            kp_n = jnp.where(take1 | take2, imax, kp)
            kstep_n = jnp.where(take1, 1, jnp.where(take2, 2, kstep))
            done_n = take1 | take2
            p_n = jnp.where(done_n, p, imax)
            colmax_n = jnp.where(done_n, colmax, rowmax)
            imax_n = jnp.where(done_n, imax, jmax)
            return (p_n, imax_n, colmax_n, done_n, kp_n, kstep_n)

        colv = col_abs_below(A, k)
        imax0 = jnp.argmax(colv)
        p, imax, colmax, done, kp, kstep = jax.lax.while_loop(
            cond, body, (k, imax, colmax, jnp.asarray(False),
                         jnp.asarray(0), jnp.asarray(1)))
        return kp, p, kstep

    def step(carry):
        A, perm, d, e, k, info = carry
        absakk = jnp.abs(A[k, k])
        colv = col_abs_below(A, k)
        imax = jnp.argmax(colv)
        colmax = jnp.where(k < m - 1, colv[imax], jnp.asarray(-jnp.inf,
                                                             dtype))

        zero_col = jnp.maximum(absakk, jnp.maximum(colmax, 0.0)) == 0.0
        plain_1x1 = absakk >= _ALPHA * colmax

        # rook search only when needed (but lax has no early out — run it
        # unconditionally on safe inputs and select)
        kp_r, p_r, kstep_r = rook_loop(A, k, jnp.maximum(imax, k),
                                       colmax)
        kp = jnp.where(zero_col | plain_1x1, k, kp_r)
        p = jnp.where(zero_col | plain_1x1, k, p_r)
        kstep = jnp.where(zero_col | plain_1x1, 1, kstep_r)

        info = jnp.where(zero_col & (info == 0), k + 1, info)

        # interchanges: for kstep=2, first bring p to k, then kp to k+1
        def swap(A, perm, i, j):
            A = _sym_swap(A, i, j)
            pi, pj = perm[i], perm[j]
            perm = perm.at[i].set(pj).at[j].set(pi)
            return A, perm

        do2 = kstep == 2
        A, perm = jax.lax.cond(
            do2 & (p != k), lambda a, q: swap(a, q, k, p),
            lambda a, q: (a, q), A, perm)
        tgt = jnp.where(do2, k + 1, k)
        A, perm = jax.lax.cond(
            kp != tgt, lambda a, q: swap(a, q, tgt, kp),
            lambda a, q: (a, q), A, perm)

        def elim_1x1(A, d, e):
            dk = A[k, k]
            safe = jnp.where(dk == 0.0, 1.0, dk)
            mask = idx > k
            l = jnp.where(mask, A[:, k] / safe, 0.0)
            A = A - jnp.where(dk == 0.0, 0.0, 1.0) * dk * jnp.outer(l, l)
            A = A.at[:, k].set(jnp.where(mask, l, A[:, k]))
            A = A.at[k, :].set(jnp.where(mask, l, A[k, :]))
            d = d.at[k].set(dk)
            return A, d, e

        def elim_2x2(A, d, e):
            a11 = A[k, k]
            a21 = A[k + 1, k]
            a22 = A[k + 1, k + 1]
            det = a11 * a22 - a21 * a21
            safe_det = jnp.where(det == 0.0, 1.0, det)
            mask = idx > k + 1
            w1 = jnp.where(mask, A[:, k], 0.0)
            w2 = jnp.where(mask, A[:, k + 1], 0.0)
            # L2 = W inv(D2)
            l1 = (w1 * a22 - w2 * a21) / safe_det
            l2 = (w2 * a11 - w1 * a21) / safe_det
            A = A - jnp.outer(l1, w1) - jnp.outer(l2, w2)
            A = A.at[:, k].set(jnp.where(mask, l1, A[:, k]))
            A = A.at[k, :].set(jnp.where(mask, l1, A[k, :]))
            A = A.at[:, k + 1].set(jnp.where(mask, l2, A[:, k + 1]))
            A = A.at[k + 1, :].set(jnp.where(mask, l2, A[k + 1, :]))
            d = d.at[k].set(a11).at[k + 1].set(a22)
            e = e.at[k].set(a21)
            return A, d, e

        A, d, e = jax.lax.cond(do2, elim_2x2, elim_1x1, A, d, e)
        return (A, perm, d, e, k + kstep, info)

    def cond(carry):
        return carry[4] < m

    A0 = 0.5 * (A + A.T)
    carry = (A0, idx.astype(jnp.int32), jnp.zeros((m,), dtype),
             jnp.zeros((m,), dtype), jnp.asarray(0), jnp.int32(0))
    Af, perm, d, e, _, info = jax.lax.while_loop(cond, step, carry)

    L = jnp.tril(Af, -1)
    # zero the subdiagonal slot of each 2x2 block (it belongs to D)
    sub = jnp.zeros((m,), dtype)
    sub = jnp.where(e[: m - 1] != 0.0, 0.0, jnp.diag(L, -1)) \
        if m > 1 else sub[:0]
    if m > 1:
        L = L - jnp.diag(jnp.diag(L, -1), -1) + jnp.diag(sub, -1)
    L = L + jnp.eye(m, dtype=dtype)
    return BKFactors(L=L, d=d, e=e, perm=perm, info=info)


def bk_inertia(f: BKFactors, atol: float = 1e-12):
    """(np, nn, nz) with the reference's exact counting rules
    (reference: src/inertia_correction.jl:96-205, real symmetric case,
    atol-only tolerance as called at :262)."""
    m = f.d.shape[0]
    d, e = f.d, f.e
    tol = jnp.asarray(atol, d.dtype)

    is2 = e != 0.0                       # start of a 2x2 block
    second = jnp.concatenate([jnp.zeros((1,), jnp.bool_), is2[:-1]])
    is1 = ~(is2 | second)

    # 1x1 blocks
    np1 = jnp.sum(jnp.where(is1 & (d > tol), 1, 0))
    nn1 = jnp.sum(jnp.where(is1 & (d < -tol), 1, 0))
    nz1 = jnp.sum(jnp.where(is1 & ~((d > tol) | (d < -tol)), 1, 0))

    # 2x2 blocks (vectorized over start positions)
    d2 = jnp.concatenate([d[1:], jnp.zeros((1,), d.dtype)])
    abs_dii = jnp.abs(d)
    abs_dxx = jnp.abs(d2)
    s1b = 2.0 * jnp.maximum(jnp.maximum(abs_dii, jnp.abs(e)), abs_dxx)
    safe = jnp.where(s1b == 0.0, 1.0, s1b)
    det_lo = jnp.where(abs_dii >= abs_dxx,
                       (d / safe) * d2 - (e / safe) * e,
                       d * (d2 / safe) - (e / safe) * e)
    smin = jnp.abs(det_lo)               # c = 1 for real matrices
    trace = d + d2

    both_zero = 0.5 * s1b <= tol         # (c/2) s1_block <= tol
    pair = (~both_zero) & ((smin > tol) | (trace == 0.0))
    one_zero = (~both_zero) & ~pair

    np2 = jnp.sum(jnp.where(is2 & (pair | (one_zero & (trace >= 0.0))),
                            1, 0))
    nn2 = jnp.sum(jnp.where(is2 & (pair | (one_zero & (trace < 0.0))),
                            1, 0))
    nz2 = jnp.sum(jnp.where(is2 & both_zero, 2, 0)
                  + jnp.where(is2 & one_zero, 1, 0))

    return np1 + np2, nn1 + nn2, nz1 + nz2


def bk_solve(f: BKFactors, rhs: Array) -> Array:
    """X = A^{-1} rhs from the factorization (plain substitution, the
    reference's ldiv! — no refinement)."""
    m = f.d.shape[0]
    b = rhs[f.perm, :]
    y = jax.scipy.linalg.solve_triangular(f.L, b, lower=True,
                                          unit_diagonal=True)
    # block-diagonal solve
    d, e = f.d, f.e
    is2 = e != 0.0
    second = jnp.concatenate([jnp.zeros((1,), jnp.bool_), is2[:-1]])
    d2 = jnp.concatenate([d[1:], jnp.zeros((1,), d.dtype)])
    det = d * d2 - e * e
    safe_det = jnp.where(det == 0.0, 1.0, det)
    safe_d = jnp.where(d == 0.0, 1.0, d)
    y_next = jnp.concatenate([y[1:], jnp.zeros((1, y.shape[1]), y.dtype)])
    y_prev = jnp.concatenate([jnp.zeros((1, y.shape[1]), y.dtype), y[:-1]])
    d_prev = jnp.concatenate([jnp.zeros((1,), d.dtype), d[:-1]])
    e_prev = jnp.concatenate([jnp.zeros((1,), e.dtype), e[:-1]])
    det_prev = jnp.concatenate([jnp.ones((1,), det.dtype), safe_det[:-1]])
    z_1x1 = y / safe_d[:, None]
    z_2x2_first = (d2[:, None] * y - e[:, None] * y_next) / safe_det[:, None]
    z_2x2_second = (d_prev[:, None] * y - e_prev[:, None] * y_prev) \
        / det_prev[:, None]
    z = jnp.where(is2[:, None], z_2x2_first,
                  jnp.where(second[:, None], z_2x2_second, z_1x1))
    x = jax.scipy.linalg.solve_triangular(f.L.T, z, lower=False,
                                          unit_diagonal=True)
    inv = jnp.argsort(f.perm)
    return x[inv, :]
