"""Backward-pass correctness: DDP gains must solve the full Newton-KKT system.

IPDDP2's backward recursion is algebraically the block elimination of the full
primal-dual Newton system of the barrier subproblem (arXiv:2504.08278; the
recursion equations live in reference: src/backward_pass.jl:62-189). This test
assembles that full system directly in NumPy over all stages — variables
(du_t, dphi_t, dzl_t, dzu_t, dx_t, dlam_t) — solves it densely, and checks the
recursion's affine update rule reproduces the exact solution when propagated
through the linearized dynamics. This pins down every sign and every
second-order term (lam.fxx, phi.cxx, Sigma assembly) at once.
"""

import jax
import jax.numpy as jnp
import numpy as np

from ipddp2tpu.backward import backward_pass
from ipddp2tpu.derivatives import evaluate_derivatives
from ipddp2tpu.options import Options
from ipddp2tpu.problem import Bounds, Problem

NX, NU, NC, T = 2, 3, 2, 4


def _mats(key):
    ks = jax.random.split(key, 8)
    A = 0.3 * jax.random.normal(ks[0], (NX, NX))
    B = 0.3 * jax.random.normal(ks[1], (NX, NU))
    W = jax.random.normal(ks[2], (NC, NU))
    V = jax.random.normal(ks[3], (NC, NX))
    # bilinear tensors: make constraint/dynamics curvature nonzero
    G = 0.3 * jax.random.normal(ks[4], (NC, NU, NU))
    Hx = 0.3 * jax.random.normal(ks[5], (NC, NX, NU))
    Dxx = 0.2 * jax.random.normal(ks[6], (NX, NX, NX))
    b = 0.5 * jax.random.normal(ks[7], (NC,))
    return A, B, W, V, G, Hx, Dxx, b


def make_problem(key):
    A, B, W, V, G, Hx, Dxx, b = _mats(key)

    def dynamics(x, u, t, theta):
        return A @ x + B @ u + 0.5 * jnp.einsum("ijk,j,k->i", Dxx, x, x)

    def stage_cost(x, u, t, theta):
        return (2.0 * jnp.dot(u, u) + 0.5 * jnp.dot(x, x)
                + 0.2 * jnp.dot(x, x) * u[0])

    def terminal_cost(x, theta):
        return 3.0 * jnp.dot(x, x)

    def constraints(x, u, t, theta):
        return (W @ u + V @ x + b
                + 0.5 * jnp.einsum("ijk,j,k->i", G, u, u)
                + jnp.einsum("ijk,j,k->i", Hx, x, u))

    prob = Problem(T=T, nx=NX, nu=NU, nc=NC, dynamics=dynamics,
                   stage_cost=stage_cost, terminal_cost=terminal_cost,
                   constraints=constraints)
    return prob


def make_state(key, prob):
    """A strictly interior primal-dual point with a feasible rollout."""
    ks = jax.random.split(key, 6)
    u = 0.3 * jax.random.normal(ks[0], (T, NU))
    x0 = 0.3 * jax.random.normal(ks[1], (NX,))
    xs = [x0]
    for t in range(T):
        xs.append(prob.dynamics(xs[t], u[t], t, None))
    x = jnp.stack(xs)
    phi = 0.5 * jax.random.normal(ks[2], (T, NC))
    zl = 0.5 + jax.random.uniform(ks[3], (T, NU))
    zu = 0.5 + jax.random.uniform(ks[4], (T, NU))
    lower = u - (0.5 + jax.random.uniform(ks[5], (T, NU)))
    upper = u + 1.0
    return x, u, phi, zl, zu, Bounds(lower=lower, upper=upper)


def full_newton_step(prob, deriv, x, u, c, il, iu, phi, zl, zu, mu):
    """Assemble and solve the full barrier-subproblem Newton system."""
    d = np.asarray
    nvar = T * (NU + NC + 2 * NU) + T * NX + T * NX  # du,dphi,dzl,dzu | dx | dlam
    iu_of = lambda t: t * NU
    iphi_of = lambda t: T * NU + t * NC
    izl_of = lambda t: T * (NU + NC) + t * NU
    izu_of = lambda t: T * (NU + NC + NU) + t * NU
    ix_of = lambda t: T * (NU + NC + 2 * NU) + (t - 1) * NX  # t = 1..T
    ilam_of = lambda t: T * (NU + NC + 2 * NU) + T * NX + (t - 1) * NX

    K = np.zeros((nvar, nvar))
    r = np.zeros(nvar)
    row = 0

    # costate from the current iterate: the recursion treats lam as freely
    # re-derived each pass, so we solve for the new lam directly (dlam = lam_new)
    for t in range(T):
        fx, fu = d(deriv.fx[t]), d(deriv.fu[t])
        cx, cu = d(deriv.cx[t]), d(deriv.cu[t])
        fH = d(deriv.fH[t])              # [nx, nz, nz]
        cH = d(deriv.cH_phi[t])          # [nz, nz]
        lxx, lux, luu = d(deriv.lxx[t]), d(deriv.lux[t]), d(deriv.luu[t])

        # u-stationarity rows: the second-order terms need lam_new which is an
        # unknown; linearized Newton uses lam_bar in the Hessian but the
        # recursion contracts with the *recomputed* lam (reference:
        # src/backward_pass.jl:105 uses lam[t+1] from the current pass). We
        # mirror that: Hessian contraction with lam_new treated as data by
        # first computing lam_new from the recursion's own formula
        # lam = lx + cx' phi + fx' lam+  backward in time.
        row += 0
    # Precompute lam_new exactly like the recursion (depends only on current
    # iterate, not on the step):
    lam_new = np.zeros((T + 1, NX))
    lam_new[T] = d(deriv.lTx)
    for t in range(T - 1, -1, -1):
        lam_new[t] = (d(deriv.lx[t]) + d(deriv.cx[t]).T @ d(phi[t])
                      + d(deriv.fx[t]).T @ lam_new[t + 1])

    for t in range(T):
        fx, fu = d(deriv.fx[t]), d(deriv.fu[t])
        cx, cu = d(deriv.cx[t]), d(deriv.cu[t])
        fH = d(deriv.fH[t])
        cH = d(deriv.cH_phi[t])
        lxx, lux, luu = d(deriv.lxx[t]), d(deriv.lux[t]), d(deriv.luu[t])
        fHl = np.einsum("i,ijk->jk", lam_new[t + 1], fH)
        Hxx = lxx + fHl[:NX, :NX] + cH[:NX, :NX]
        Hux = lux + fHl[NX:, :NX] + cH[NX:, :NX]
        Huu = luu + fHl[NX:, NX:] + cH[NX:, NX:]

        # u-stationarity: Huu du + Hux dx + cu' dphi + fu' lam_new+ - dzl + dzu
        #   = -(lu + cu' phi - zl + zu)        [fu' lam+ enters via unknown]
        rows = slice(row, row + NU)
        K[rows, iu_of(t):iu_of(t) + NU] += Huu
        if t >= 1:
            K[rows, ix_of(t):ix_of(t) + NX] += Hux
        K[rows, iphi_of(t):iphi_of(t) + NC] += cu.T
        K[rows, ilam_of(t + 1):ilam_of(t + 1) + NX] += fu.T
        K[rows, izl_of(t):izl_of(t) + NU] -= np.eye(NU)
        K[rows, izu_of(t):izu_of(t) + NU] += np.eye(NU)
        r[rows] = -(d(deriv.lu[t]) + cu.T @ d(phi[t]) - d(zl[t]) + d(zu[t]))
        row += NU

        # x-stationarity for t >= 1:
        # Hxu du + Hxx dx + cx' dphi + fx' lam_new+ - lam_new_t = -(lx + cx' phi)
        if t >= 1:
            rows = slice(row, row + NX)
            K[rows, iu_of(t):iu_of(t) + NU] += Hux.T
            K[rows, ix_of(t):ix_of(t) + NX] += Hxx
            K[rows, iphi_of(t):iphi_of(t) + NC] += cx.T
            K[rows, ilam_of(t + 1):ilam_of(t + 1) + NX] += fx.T
            K[rows, ilam_of(t):ilam_of(t) + NX] -= np.eye(NX)
            r[rows] = -(d(deriv.lx[t]) + cx.T @ d(phi[t]))
            row += NX

        # constraint rows: cu du + cx dx = -c
        rows = slice(row, row + NC)
        K[rows, iu_of(t):iu_of(t) + NU] += cu
        if t >= 1:
            K[rows, ix_of(t):ix_of(t) + NX] += cx
        r[rows] = -d(c[t])
        row += NC

        # dynamics rows: fx dx + fu du - dx_{t+1} = 0
        rows = slice(row, row + NX)
        K[rows, iu_of(t):iu_of(t) + NU] += fu
        if t >= 1:
            K[rows, ix_of(t):ix_of(t) + NX] += fx
        K[rows, ix_of(t + 1):ix_of(t + 1) + NX] -= np.eye(NX)
        r[rows] = 0.0
        row += NX

        # complementarity: zl du + il dzl = mu - il zl ; -zu du + iu dzu = ...
        rows = slice(row, row + NU)
        K[rows, iu_of(t):iu_of(t) + NU] += np.diag(d(zl[t]))
        K[rows, izl_of(t):izl_of(t) + NU] += np.diag(d(il[t]))
        r[rows] = mu - d(il[t]) * d(zl[t])
        row += NU
        rows = slice(row, row + NU)
        K[rows, iu_of(t):iu_of(t) + NU] -= np.diag(d(zu[t]))
        K[rows, izu_of(t):izu_of(t) + NU] += np.diag(d(iu[t]))
        r[rows] = mu - d(iu[t]) * d(zu[t])
        row += NU

    # terminal x-stationarity: lTxx dx_T - lam_new_T = -(lTx)
    rows = slice(row, row + NX)
    K[rows, ix_of(T):ix_of(T) + NX] += d(deriv.lTxx)
    K[rows, ilam_of(T):ilam_of(T) + NX] -= np.eye(NX)
    r[rows] = -d(deriv.lTx)
    row += NX

    assert row == nvar
    sol = np.linalg.solve(K, r)
    du = sol[:T * NU].reshape(T, NU)
    dphi = sol[T * NU:T * (NU + NC)].reshape(T, NC)
    dzl = sol[T * (NU + NC):T * (NU + NC + NU)].reshape(T, NU)
    dzu = sol[T * (NU + NC + NU):T * (NU + NC + 2 * NU)].reshape(T, NU)
    dx = sol[T * (NU + NC + 2 * NU):T * (NU + NC + 2 * NU) + T * NX]
    dx = np.concatenate([np.zeros((1, NX)), dx.reshape(T, NX)])
    return du, dphi, dzl, dzu, dx


import pytest


@pytest.mark.parametrize("problem_seed,state_seed", [(0, 1), (7, 3)])
def test_gains_solve_full_newton_system(problem_seed, state_seed):
    key = jax.random.PRNGKey(problem_seed)
    prob = make_problem(key)
    x, u, phi, zl, zu, bounds = make_state(jax.random.PRNGKey(state_seed),
                                           prob)
    mu = 0.1
    il = u - bounds.lower
    iu = bounds.upper - u
    c = jax.vmap(lambda xt, ut, t: prob.constraints(xt, ut, t, None))(
        x[:T], u, jnp.arange(T))

    deriv = evaluate_derivatives(prob, None, x, u, phi,
                                 with_dynamics_hessian=True)
    options = Options(inertia_method="eigh", refine_steps=2)
    bw = backward_pass(prob, deriv, (c, il, iu, phi, zl, zu),
                       jnp.asarray(mu, jnp.float64), jnp.zeros(()), options)
    assert int(bw.status) == 0
    assert float(bw.reg) == 0.0, "test problem must not need regularization"

    du_ref, dphi_ref, dzl_ref, dzu_ref, dx_ref = full_newton_step(
        prob, deriv, x, u, c, il, iu, phi, zl, zu, mu)

    # propagate the affine update rule through the linearized dynamics
    g = bw.gains
    dx = np.zeros(NX)
    for t in range(T):
        du = np.asarray(g.alpha[t]) + np.asarray(g.beta[t]) @ dx
        dphi = np.asarray(g.psi[t]) + np.asarray(g.omega[t]) @ dx
        dzl = np.asarray(g.chi_l[t]) + np.asarray(g.zeta_l[t]) @ dx
        dzu = np.asarray(g.chi_u[t]) + np.asarray(g.zeta_u[t]) @ dx
        np.testing.assert_allclose(du, du_ref[t], atol=1e-8, err_msg=f"du t={t}")
        np.testing.assert_allclose(dphi, dphi_ref[t], atol=1e-8,
                                   err_msg=f"dphi t={t}")
        np.testing.assert_allclose(dzl, dzl_ref[t], atol=1e-8,
                                   err_msg=f"dzl t={t}")
        np.testing.assert_allclose(dzu, dzu_ref[t], atol=1e-8,
                                   err_msg=f"dzu t={t}")
        dx = (np.asarray(deriv.fx[t]) @ dx + np.asarray(deriv.fu[t]) @ du)
        np.testing.assert_allclose(dx, dx_ref[t + 1], atol=1e-8,
                                   err_msg=f"dx t={t + 1}")
