"""Forward megakernel parity (ops/forward_pallas.py), interpret mode.

The fused metrics/trial kernels must reproduce the XLA speculative forward
pass on REAL mid-solve states. Two practicalities of interpret mode shape
these tests:
  * the grid is UNROLLED into the compiled program (T x K kernel-body
    copies), so parity runs on SHORT-HORIZON variants of the benchmark
    problems (same dynamics/costs/constraints/theta, T=16) — full-horizon
    coverage is the on-chip bench;
  * XLA:CPU's compiled code contracts the df64 error-free transforms
    (~1e-10 over a 100-stage recursion; see ops/df64.py docstring) — parity
    here is asserted at 1e-5/1e-7; on-chip Mosaic precision is pinned by
    scripts/tpu_dd_probe.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ipddp2tpu import Options
from ipddp2tpu.backward import backward_pass, costate_scan
from ipddp2tpu.derivatives import (contract_dynamics_hessian,
                                   evaluate_derivatives, relax_constraints)
from ipddp2tpu.forward import (Trial, _forward_pass_speculative_xla,
                               forward_pass_speculative)
from ipddp2tpu.models import concar, double_integrator as di
from ipddp2tpu.problem import Bounds, Problem
from ipddp2tpu.solve import initialize, run

B = 4
T_SHORT = 16
K = 4


def _short(mod):
    """Short-horizon variant of a benchmark problem (same stage math)."""
    return Problem(T=T_SHORT, nx=mod.NX, nu=mod.NU, nc=mod.NC,
                   dynamics=mod.dynamics, stage_cost=mod.stage_cost,
                   terminal_cost=mod.terminal_cost,
                   constraints=mod.constraints)


def _mid_state(prob, bounds, x1s, u0, thetas, opts, k=10):
    st = jax.vmap(lambda b, x, u, th: initialize(prob, th, b, x, u, opts),
                  in_axes=(Bounds(0, 0), 0, 0,
                           None if thetas is None else 0))(
        bounds, x1s, u0, thetas)
    st = jax.vmap(lambda s, b, th: run(prob, b, s, th, opts, k_limit=k),
                  in_axes=(0, Bounds(0, 0), None if thetas is None else 0))(
        st, bounds, thetas)

    def per_inst(s, b, th):
        deriv = evaluate_derivatives(prob, th, s.x, s.u, s.phi)
        c_rel = relax_constraints(prob, s.c_raw, s.mu)
        lam = costate_scan(deriv, s.phi)
        second = deriv.cH_phi + contract_dynamics_hessian(
            prob, th, s.x, s.u, lam[1:])
        bw = backward_pass(prob, deriv,
                           (c_rel, s.il, s.iu, s.phi, s.zl, s.zu),
                           s.mu, s.reg_last, opts, lam=lam, second=second)
        return bw.gains, bw.dL
    gains, dL = jax.vmap(per_inst,
                         in_axes=(0, Bounds(0, 0),
                                  None if thetas is None else 0))(
        st, bounds, thetas)
    return st, gains, dL


def _compare(prob, bounds, thetas, st, gains, dL, opts):
    nominal = Trial(x=st.x, u=st.u, c_raw=st.c_raw, il=st.il, iu=st.iu,
                    phi=st.phi, zl=st.zl, zu=st.zu)
    args = (thetas, bounds, gains, nominal, dL, st.mu, st.theta_curr,
            st.L_curr, st.min_primal_1, st.filter_pts)
    theta_ax = None if thetas is None else 0

    def xla_one(theta, b, g, nom, dl, mu, thp, lp, mp1, fp):
        return _forward_pass_speculative_xla(
            prob, theta, b, g, nom, dl, mu, thp, lp, mp1, fp, opts)

    ref = jax.vmap(xla_one, in_axes=(theta_ax, Bounds(0, 0), 0, 0, 0, 0,
                                     0, 0, 0, 0))(*args)

    kopts = opts.__class__(**{**opts.__dict__, "forward_kernel": "pallas"})
    got = jax.vmap(
        lambda theta, b, g, nom, dl, mu, thp, lp, mp1, fp:
        forward_pass_speculative(prob, theta, b, g, nom, dl, mu, thp,
                                 lp, mp1, fp, kopts),
        in_axes=(theta_ax, Bounds(0, 0), 0, 0, 0, 0, 0, 0, 0, 0))(*args)
    return ref, got


def _assert_result_parity(ref, got, tol):
    np.testing.assert_array_equal(np.asarray(got.status),
                                  np.asarray(ref.status))
    np.testing.assert_array_equal(np.asarray(got.step_size),
                                  np.asarray(ref.step_size))
    np.testing.assert_array_equal(np.asarray(got.num_ls),
                                  np.asarray(ref.num_ls))
    np.testing.assert_array_equal(np.asarray(got.armijo_passed),
                                  np.asarray(ref.armijo_passed))
    for name in ("theta_next", "L_next", "objective"):
        a, b = np.asarray(getattr(ref, name)), np.asarray(getattr(got, name))
        np.testing.assert_allclose(b, a, rtol=tol, atol=tol)
    for name in ("x", "u", "phi", "zl", "zu", "il", "iu", "c_raw"):
        a = np.asarray(getattr(ref.trial, name))
        b = np.asarray(getattr(got.trial, name))
        mask = np.isfinite(a)
        np.testing.assert_array_equal(np.isfinite(b), mask)
        np.testing.assert_allclose(b[mask], a[mask], rtol=tol, atol=tol)


@pytest.mark.parametrize("dtype", ["f64", "f32"])
@pytest.mark.kernels
def test_speculative_kernel_matches_xla_concar(dtype):
    prob = _short(concar)
    opts = Options(optimality_tolerance=1e-7, backward_kernel="xla",
                   auto_tune=False, ls_speculative=K)
    keys = jax.random.split(jax.random.PRNGKey(3), B)
    thetas, f_lims, tau_lims, x1s = jax.vmap(concar.random_instance)(keys)
    bounds = jax.tree.map(lambda a: a[:, :T_SHORT],
                          concar.bounds(f_lims, tau_lims))
    u0 = jnp.broadcast_to(concar.initial_controls()[:T_SHORT],
                          (B, T_SHORT, concar.NU))
    st, gains, dL = _mid_state(prob, bounds, x1s, u0, thetas, opts)
    if dtype == "f32":
        cast = lambda a: (a.astype(jnp.float32)
                          if jnp.issubdtype(a.dtype, jnp.floating) else a)
        st = jax.tree.map(cast, st)
        gains = jax.tree.map(cast, gains)
        thetas = jax.tree.map(cast, thetas)
        bounds = jax.tree.map(cast, bounds)
        dL = cast(dL)
    ref, got = _compare(prob, bounds, thetas, st, gains, dL, opts)
    # f32: identical-op-level math, small reassociation. f64 via dd pairs:
    # interpret-mode XLA:CPU contraction noise (~1e-10/stage, amplified by
    # feedback gains on dual trajectories) dominates; the on-chip Mosaic
    # path measures 1.3e-13 over 100 stages (scripts/tpu_dd_probe.py)
    _assert_result_parity(ref, got, tol=1e-4 if dtype == "f32" else 1e-5)


@pytest.mark.kernels
def test_speculative_kernel_matches_xla_no_theta():
    """theta=None problem (double integrator) through the kernel path."""
    prob = _short(di)
    opts = Options(optimality_tolerance=1e-7, backward_kernel="xla",
                   auto_tune=False, ls_speculative=K)
    bounds = jax.tree.map(
        lambda a: jnp.broadcast_to(a[:T_SHORT], (B, T_SHORT, di.NU)),
        di.bounds())
    x1s = jnp.broadcast_to(di.initial_state(), (B, di.NX))
    x1s = x1s + 1e-3 * jax.random.normal(jax.random.PRNGKey(0), x1s.shape)
    u0 = jnp.broadcast_to(di.initial_controls()[:T_SHORT],
                          (B, T_SHORT, di.NU))
    st, gains, dL = _mid_state(prob, bounds, x1s, u0, None, opts, k=5)
    ref, got = _compare(prob, bounds, None, st, gains, dL, opts)
    _assert_result_parity(ref, got, tol=1e-7)


@pytest.mark.parametrize("spec", [8, 0])
@pytest.mark.kernels
def test_full_solve_with_forward_kernel(spec):
    """End-to-end solve with the forward kernel forced ON (interpret mode)
    must certify the same optimum as the pure XLA path — BOTH line-search
    modes: speculative (metrics kernel) and sequential backtracking (trial
    kernel per gamma; spec=0 — the path that caught the lru-cached-tracer
    regression). Short-horizon double integrator: interpret-mode kernels
    unroll the grid into the program, so the end-to-end check uses T=16;
    full-horizon coverage comes from the mid-solve parity tests above and
    the on-chip bench."""
    from ipddp2tpu.batch import solve_batch

    n = 2
    prob = _short(di)
    bounds = jax.tree.map(
        lambda a: jnp.broadcast_to(a[:T_SHORT], (n, T_SHORT, di.NU)),
        di.bounds())
    x1s = jnp.broadcast_to(di.initial_state(), (n, di.NX))
    x1s = x1s + 1e-3 * jax.random.normal(jax.random.PRNGKey(0), x1s.shape)
    u0 = jnp.broadcast_to(di.initial_controls()[:T_SHORT],
                          (n, T_SHORT, di.NU))
    base = Options(optimality_tolerance=1e-7, max_iterations=120,
                   auto_tune=False, ls_speculative=spec)
    ref = solve_batch(prob, bounds, x1s, u0, options=base)
    kopts = base.__class__(**{**base.__dict__, "forward_kernel": "pallas"})
    got = solve_batch(prob, bounds, x1s, u0, options=kopts)
    conv = np.asarray(ref.converged)
    assert conv.all(), np.asarray(ref.status)
    np.testing.assert_array_equal(np.asarray(got.converged), conv)
    np.testing.assert_allclose(np.asarray(got.objective),
                               np.asarray(ref.objective), rtol=1e-6)
    assert float(np.max(np.asarray(got.dual_inf))) < 1e-7
