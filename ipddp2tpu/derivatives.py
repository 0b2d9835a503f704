"""Derivative bundle evaluation.

Replaces the reference's Symbolics.jl code generation (reference:
src/objectives.jl:12-33, src/dynamics.jl:15-42, src/constraints.jl:16-50,
driver src/derivatives.jl:31-35) with `jax.jacfwd` / second-order forward-mode
composition, vmapped over the time axis. One jitted call evaluates every
Jacobian/Hessian the backward pass needs for a whole trajectory — under an
outer `vmap` this batches over problem instances as well, which is where the
MXU parallelism comes from.

Working variable: z = concat(x, u), so each stage's second-order data is one
dense [nz, nz] block that the backward pass slices — no ragged per-block
bookkeeping.

The dynamics second-order term `lam . d2f` cannot be pre-contracted outside the
backward scan because the costate lam_{t+1} is produced *by* the scan
(reference: src/backward_pass.jl:105,189). We therefore precompute the full
dynamics Hessian tensor fH[t] = d2 f(z_t) with shape [nx, nz, nz] once per
solver iteration and contract it with the carried costate inside the scan —
an einsum that XLA fuses into the stage GEMMs. The constraint contraction uses
the *nominal* equality duals phi and is pre-contracted here, exactly like the
reference (reference: src/derivatives.jl:19-29).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from .problem import Problem

Array = jax.Array


class DerivativeBundle(NamedTuple):
    """All stagewise derivatives for one trajectory (leading axis T)."""

    fx: Array          # [T, nx, nx]
    fu: Array          # [T, nx, nu]
    fH: Optional[Array]   # [T, nx, nz, nz] dynamics Hessians (None if quasi-Newton)
    lx: Array          # [T, nx]
    lu: Array          # [T, nu]
    lxx: Array         # [T, nx, nx]
    lux: Array         # [T, nu, nx]
    luu: Array         # [T, nu, nu]
    cx: Array          # [T, nc, nx]
    cu: Array          # [T, nc, nu]
    cH_phi: Optional[Array]  # [T, nz, nz] phi-contracted constraint Hessians
    lTx: Array         # [nx]     terminal cost gradient
    lTxx: Array        # [nx, nx] terminal cost Hessian


def _zfun(fn, nx, t, theta):
    """Lift fn(x, u, t, theta) to a function of z = concat(x, u)."""
    return lambda z: fn(z[:nx], z[nx:], t, theta)


def evaluate_derivatives(
    problem: Problem,
    theta,
    x: Array,          # [T+1, nx] nominal states
    u: Array,          # [T, nu]  nominal controls
    phi: Array,        # [T, nc]  nominal equality duals (for cH contraction)
    *,
    quasi_newton: bool = False,
    with_dynamics_hessian: bool = False,
) -> DerivativeBundle:
    nx, nu, nc, T = problem.nx, problem.nu, problem.nc, problem.T
    nz = nx + nu
    ts = jnp.arange(T)
    z = jnp.concatenate([x[:T], u], axis=1)  # [T, nz]

    def stage(z_t, t, phi_t):
        f = _zfun(problem.dynamics, nx, t, theta)
        l = _zfun(problem.stage_cost, nx, t, theta)

        fj = jax.jacfwd(f)(z_t)                      # [nx, nz]
        lg = jax.grad(l)(z_t)                        # [nz]
        lH = jax.jacfwd(jax.grad(l))(z_t)            # [nz, nz]

        out = dict(
            fx=fj[:, :nx], fu=fj[:, nx:],
            lx=lg[:nx], lu=lg[nx:],
            lxx=lH[:nx, :nx], lux=lH[nx:, :nx], luu=lH[nx:, nx:],
        )

        if nc > 0:
            c = _zfun(problem.eval_constraints, nx, t, theta)
            cj = jax.jacfwd(c)(z_t)                  # [nc, nz]
            out.update(cx=cj[:, :nx], cu=cj[:, nx:])
            if not quasi_newton:
                cphi = lambda zz: jnp.dot(phi_t, c(zz))
                out["cH_phi"] = jax.jacfwd(jax.grad(cphi))(z_t)   # [nz, nz]
        else:
            out.update(
                cx=jnp.zeros((0, nx), z_t.dtype),
                cu=jnp.zeros((0, nu), z_t.dtype),
            )
            if not quasi_newton:
                out["cH_phi"] = jnp.zeros((nz, nz), z_t.dtype)

        if with_dynamics_hessian and not quasi_newton:
            # full [nx, nz, nz] tensor: only for tests/diagnostics — the
            # solver pre-contracts with the costate instead
            # (contract_dynamics_hessian), which is O(nz^2) not O(nx nz^2)
            out["fH"] = jax.jacfwd(jax.jacfwd(f))(z_t)
        return out

    stacked = jax.vmap(stage)(z, ts, phi)

    lT = lambda xx: problem.terminal_cost(xx, theta)
    lTx = jax.grad(lT)(x[T])
    lTxx = jax.jacfwd(jax.grad(lT))(x[T])

    return DerivativeBundle(
        fx=stacked["fx"], fu=stacked["fu"],
        fH=stacked.get("fH"),
        lx=stacked["lx"], lu=stacked["lu"],
        lxx=stacked["lxx"], lux=stacked["lux"], luu=stacked["luu"],
        cx=stacked["cx"], cu=stacked["cu"],
        cH_phi=stacked.get("cH_phi"),
        lTx=lTx, lTxx=lTxx,
    )


def contract_dynamics_hessian(problem: Problem, theta, x: Array, u: Array,
                              lam_next: Array) -> Array:
    """lam_{t+1} . d2f(z_t) as [T, nz, nz] — the Hessian of the scalar
    z -> <lam, f(z)> per stage, never materializing the full [nx, nz, nz]
    tensor (reference: src/dynamics.jl:29-31 builds the same contraction
    symbolically). The costate is available before the backward sweep via the
    affine recursion lam_t = r_x + fx' lam_{t+1} (see
    parallel.priccati.costate_scan), so this runs vectorized over T outside
    the sequential scan."""
    nx = problem.nx

    def one(z_t, t, lam_n):
        f = _zfun(problem.dynamics, nx, t, theta)
        g = lambda zz: jnp.dot(lam_n, f(zz))
        return jax.jacfwd(jax.grad(g))(z_t)

    z = jnp.concatenate([x[: problem.T], u], axis=1)
    return jax.vmap(one)(z, jnp.arange(problem.T), lam_next)


def evaluate_objective(problem: Problem, theta, x: Array, u: Array) -> Array:
    """Total objective J = sum_t l(x_t, u_t, t) + lT(x_T)
    (reference: src/objectives.jl:37-46)."""
    ts = jnp.arange(problem.T)
    stage_vals = jax.vmap(
        lambda xt, ut, t: problem.stage_cost(xt, ut, t, theta)
    )(x[: problem.T], u, ts)
    return jnp.sum(stage_vals) + problem.terminal_cost(x[problem.T], theta)


def evaluate_constraints(
    problem: Problem, theta, x: Array, u: Array
) -> Array:
    """Raw (un-relaxed) stagewise equality constraints, [T, nc].

    The mu-relaxation of complementarity rows (reference:
    src/data/methods.jl:27-29) is applied by the caller via
    `relax_constraints`, so the stored values stay mu-independent.
    """
    ts = jnp.arange(problem.T)
    return jax.vmap(
        lambda xt, ut, t: problem.eval_constraints(xt, ut, t, theta)
    )(x[: problem.T], u, ts)


def relax_constraints(problem: Problem, c_raw: Array, mu) -> Array:
    """Apply c[i] -= mu on complementarity rows (reference: src/data/methods.jl:27-29)."""
    if not problem.compl_indices:
        return c_raw
    mask = problem.compl_mask(c_raw.dtype)
    return c_raw - mu * mask
