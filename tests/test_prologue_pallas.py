"""Fused iteration-prologue kernel parity (ops/prologue_pallas.py),
interpret mode.

The fused sweep must reproduce the XLA prologue composition
(evaluate_derivatives + costate_scan(mode="seq") + cH_phi +
contract_dynamics_hessian) on REAL mid-solve states. Interpret mode
unrolls the grid into the compiled program, so parity runs on
SHORT-HORIZON variants of the benchmark problems (same stage math,
T=16) — full-horizon coverage is the on-chip bench.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ipddp2tpu import Options
from ipddp2tpu.backward import compute_prologue, costate_scan
from ipddp2tpu.derivatives import (contract_dynamics_hessian,
                                   evaluate_derivatives)
from ipddp2tpu.models import concar, double_integrator as di
from ipddp2tpu.ops.prologue_pallas import prologue_sweep_pallas
from ipddp2tpu.problem import Bounds, Problem
from ipddp2tpu.solve import initialize, run

B = 4
T_SHORT = 16


def _short(mod):
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
    return st


def _xla_prologue(prob, thetas, st, f32=False):
    """The reference composition, per instance (seq costate order — the
    kernel's accumulation order)."""

    def one(theta, x, u, phi):
        deriv = evaluate_derivatives(prob, theta, x, u, phi)
        lam = costate_scan(deriv, phi, mode="seq", kernel="xla")
        second = deriv.cH_phi + contract_dynamics_hessian(
            prob, theta, x, u, lam[1:])
        return deriv, lam, second

    tax = None if thetas is None else 0
    x, u, phi = st.x, st.u, st.phi
    if f32:
        cast = lambda a: a.astype(jnp.float32)
        x, u, phi = cast(x), cast(u), cast(phi)
        thetas = jax.tree.map(cast, thetas)
    return jax.vmap(one, in_axes=(tax, 0, 0, 0))(thetas, x, u, phi), \
        (thetas, x, u, phi)


def _assert_close(ref, got, tol):
    a, b = np.asarray(ref), np.asarray(got)
    np.testing.assert_allclose(b, a, rtol=tol, atol=tol)


FIELDS = ("fx", "fu", "lx", "lu", "lxx", "lux", "luu", "cx", "cu")


@pytest.mark.kernels
def test_prologue_kernel_matches_xla_concar():
    prob = _short(concar)
    opts = Options(optimality_tolerance=1e-7, auto_tune=False)
    keys = jax.random.split(jax.random.PRNGKey(3), B)
    thetas, f_lims, tau_lims, x1s = jax.vmap(concar.random_instance)(keys)
    bounds = jax.tree.map(lambda a: a[:, :T_SHORT],
                          concar.bounds(f_lims, tau_lims))
    u0 = jnp.broadcast_to(concar.initial_controls()[:T_SHORT],
                          (B, T_SHORT, concar.NU))
    st = _mid_state(prob, bounds, x1s, u0, thetas, opts)

    (deriv, lam, second), (th32, x32, u32, phi32) = _xla_prologue(
        prob, thetas, st, f32=True)
    res = prologue_sweep_pallas(prob, th32, x32, u32, phi32,
                                np.asarray(deriv.lTx), interpret=True)

    for name in FIELDS:
        _assert_close(getattr(deriv, name), res[name], 1e-5)
    # the costate recursion + contraction amplify over stages
    _assert_close(lam, res["lam"], 1e-4)
    _assert_close(second, res["second"], 1e-4)


@pytest.mark.kernels
def test_prologue_kernel_matches_xla_no_theta():
    """theta=None + nc=0 problem (double integrator): exercises the nc1
    constraint padding and the theta-free kernel signature."""
    prob = _short(di)
    opts = Options(optimality_tolerance=1e-7, auto_tune=False)
    bounds = jax.tree.map(
        lambda a: jnp.broadcast_to(a[:T_SHORT], (B, T_SHORT, di.NU)),
        di.bounds())
    x1s = jnp.broadcast_to(di.initial_state(), (B, di.NX))
    x1s = x1s + 1e-3 * jax.random.normal(jax.random.PRNGKey(0), x1s.shape)
    u0 = jnp.broadcast_to(di.initial_controls()[:T_SHORT],
                          (B, T_SHORT, di.NU))
    st = _mid_state(prob, bounds, x1s, u0, None, opts, k=5)

    (deriv, lam, second), (_, x32, u32, phi32) = _xla_prologue(
        prob, None, st, f32=True)
    res = prologue_sweep_pallas(prob, None, x32, u32, phi32,
                                np.asarray(deriv.lTx), interpret=True)

    for name in FIELDS:
        _assert_close(getattr(deriv, name), res[name], 1e-6)
    _assert_close(lam, res["lam"], 1e-5)
    _assert_close(second, res["second"], 1e-5)


def test_compute_prologue_dispatch_single_matches_inline():
    """The custom_vmap single path must be the exact inline composition
    solve.py previously ran (golden-anchor safety): compare unbatched."""
    prob = _short(concar)
    opts = Options(optimality_tolerance=1e-7, auto_tune=False)
    keys = jax.random.split(jax.random.PRNGKey(5), B)
    thetas, f_lims, tau_lims, x1s = jax.vmap(concar.random_instance)(keys)
    bounds = jax.tree.map(lambda a: a[:, :T_SHORT],
                          concar.bounds(f_lims, tau_lims))
    u0 = jnp.broadcast_to(concar.initial_controls()[:T_SHORT],
                          (B, T_SHORT, concar.NU))
    st = _mid_state(prob, bounds, x1s, u0, thetas, opts, k=6)

    th0 = jax.tree.map(lambda a: a[0], thetas)
    x0, u0_, phi0 = st.x[0], st.u[0], st.phi[0]
    deriv_ref = evaluate_derivatives(prob, th0, x0, u0_, phi0)
    lam_ref = costate_scan(deriv_ref, phi0)
    second_ref = deriv_ref.cH_phi + contract_dynamics_hessian(
        prob, th0, x0, u0_, lam_ref[1:])

    deriv, lam, second = compute_prologue(prob, th0, x0, u0_, phi0, opts)
    for name in FIELDS + ("lTx", "lTxx"):
        np.testing.assert_array_equal(np.asarray(getattr(deriv, name)),
                                      np.asarray(getattr(deriv_ref, name)))
    np.testing.assert_array_equal(np.asarray(lam), np.asarray(lam_ref))
    np.testing.assert_array_equal(np.asarray(second),
                                  np.asarray(second_ref))
