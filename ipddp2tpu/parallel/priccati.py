"""Time-parallel backward pass: associative-scan Riccati recursion.

The reference's backward pass is strictly sequential over the horizon
(reference: src/backward_pass.jl:58); this module re-derives it as an
associative scan — the framework's "sequence parallelism" axis (SURVEY.md
§2.3, §5; cf. "Parallelization of Riccati Recursion" and the temporal
parallelization of LQT by Sarkka & Garcia-Fernandez, PAPERS.md).

Given the current iterate, every condensed stage defines a linear-fractional
map on the quadratic value function V(dx) = 1/2 dx' J dx - eta' dx. Writing
the stage's local primal-dual block (controls + equality duals, with the
barrier Sigma terms and the second-order contractions folded in)

    S = [ H_loc + reg I   cu' ]     F = [fu  0]      G = [ M ]
        [ cu             -d_c I]                         [ cx]

the stage element is the 5-tuple

    A = fx - F S^{-1} G          (closed-loop transition)
    b = -F S^{-1} r              (feedforward offset),   r = [r_u; c]
    C = F S^{-1} F'              (control-induced value curvature)
    J = Q - G' S^{-1} G          (cost-to-go curvature seed)
    eta = -(r_x - G' S^{-1} r)   (cost-to-go gradient seed)

and value propagation composes by the standard parallel-LQT rule, which is
associative — so `jax.lax.associative_scan` evaluates all suffix value
functions in O(log T) depth. The per-stage gains are then recovered by one
`vmap`ped KKT solve per stage against the scanned V_{t+1} — exactly the same
K_t systems the sequential pass factors, so the inertia-correction semantics
(count n_pos == nu per stage, bump reg on failure: reference
src/inertia_correction.jl:257-276) carry over unchanged, now as a batched
post-check instead of a sequential abort.

In exact arithmetic this reproduces the sequential backward pass gain-for-
gain; numerically the LFT compositions can lose accuracy on ill-conditioned
stages, so the mode is opt-in (options.backward_mode = "parallel").
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..derivatives import DerivativeBundle
from ..options import Options
from ..problem import Problem

Array = jax.Array


class ValueElement(NamedTuple):
    A: Array     # [T, nx, nx]
    b: Array     # [T, nx]
    C: Array     # [T, nx, nx]
    eta: Array   # [T, nx]
    J: Array     # [T, nx, nx]


def combine(a, b):
    """Associative composition of value elements.

    Elements are stored in reverse time order (scan index 0 = the terminal
    element, index k = stage T-k), so in fn(a, b) the first operand `a` is
    the terminal-side accumulation (the value being propagated, subscript j
    below) and `b` is the earlier-in-time stage being applied (subscript i).
    Formulas are the parallel-LQT combination rule (Sarkka &
    Garcia-Fernandez 2021, Lemma 10)."""
    Aj, bj, Cj, etaj, Jj = a
    Ai, bi, Ci, etai, Ji = b

    nx = Ai.shape[-1]
    I = jnp.eye(nx, dtype=Ai.dtype)
    # solve against (I + C_i J_j) once; reuse for the transposed system
    M = I + Ci @ Jj
    solve = lambda B: jnp.linalg.solve(M, B)
    solveT = lambda B: jnp.linalg.solve(M.swapaxes(-1, -2), B)

    A = Aj @ solve(Ai)
    b = (Aj @ solve(bi[..., None] + Ci @ etaj[..., None]))[..., 0] + bj
    C = Aj @ solve(Ci) @ Aj.swapaxes(-1, -2) + Cj
    eta = (Ai.swapaxes(-1, -2)
           @ solveT(etaj[..., None] - Jj @ bi[..., None]))[..., 0] + etai
    J = Ai.swapaxes(-1, -2) @ solveT(Jj @ Ai) + Ji
    # C and J are symmetric in exact arithmetic; like the sequential Vxx
    # recursion, compositions amplify roundoff asymmetry geometrically unless
    # it is projected out each step.
    C = 0.5 * (C + C.swapaxes(-1, -2))
    J = 0.5 * (J + J.swapaxes(-1, -2))
    return ValueElement(A, b, C, eta, J)


def _stage_blocks(problem: Problem, deriv: DerivativeBundle, nominal,
                  mu, second, reg, delta_c, options: Options):
    """Per-stage local KKT blocks (vmapped over T). Mirrors the condensation
    in backward._run_pass but WITHOUT the fu' Vxx' fu coupling — that arises
    through composition. `second` is the pre-contracted lam.d2f + phi.d2c
    per stage ([T, nz, nz], zeros in quasi-Newton mode)."""
    nx, nu, nc = problem.nx, problem.nu, problem.nc
    c_rel, il, iu, phi, zl, zu = nominal

    def one(fx, fu, lx, lu, lxx, lux, luu, cx, cu, sec,
            c_t, il_t, iu_t, phi_t, zl_t, zu_t):
        dtype = il_t.dtype
        sl = 1.0 / il_t
        su = 1.0 / iu_t
        sig = zl_t * sl + zu_t * su

        Q = lxx
        Mx = lux
        R = luu + jnp.diag(sig)
        if not options.quasi_newton:
            Q = Q + sec[:nx, :nx]
            Mx = Mx + sec[nx:, :nx]
            R = R + sec[nx:, nx:]
        R = R + reg * jnp.eye(nu, dtype=dtype)

        r_u = lu + cu.T @ phi_t - mu * sl + mu * su
        r_x = lx + cx.T @ phi_t

        m = nu + nc
        S = jnp.zeros((m, m), dtype)
        S = S.at[:nu, :nu].set(R)
        if nc > 0:
            S = S.at[:nu, nu:].set(cu.T)
            S = S.at[nu:, :nu].set(cu)
            S = S.at[nu:, nu:].set(-delta_c * jnp.eye(nc, dtype=dtype))
        F = jnp.concatenate([fu, jnp.zeros((nx, nc), dtype)], axis=1)  # [nx,m]
        G = jnp.concatenate([Mx, cx], axis=0)                          # [m,nx]
        r = jnp.concatenate([r_u, c_t])                                # [m]

        SiG = jnp.linalg.solve(S, G)
        SiF = jnp.linalg.solve(S, F.T)
        Sir = jnp.linalg.solve(S, r)

        A = fx - F @ SiG
        b = -F @ Sir
        C = F @ SiF
        J = Q - G.T @ SiG
        eta = -(r_x - G.T @ Sir)
        return ValueElement(A=A, b=b, C=C, eta=eta, J=J)

    return jax.vmap(one)(deriv.fx, deriv.fu,
                         deriv.lx, deriv.lu, deriv.lxx, deriv.lux, deriv.luu,
                         deriv.cx, deriv.cu, second,
                         c_rel, il, iu, phi, zl, zu)


from ..backward import costate_scan  # noqa: E402  (canonical home moved)


def backward_pass_parallel(problem: Problem, deriv: DerivativeBundle,
                           nominal, mu, reg_last, options: Options, *,
                           lam=None, second=None, value_scan=None):
    """Drop-in time-parallel replacement for `backward.backward_pass`.

    O(log T) depth: associative costate scan -> stage elements (vmapped local
    solves) -> associative value scan -> vmapped per-stage KKT factor+solve
    for the gains, with the same inertia-correction ladder semantics as the
    sequential pass (now a batched post-check over all stages at once).

    `value_scan` swaps the suffix-value evaluator (same contract as
    `parallel_value_scan`, the default): `timeshard.value_scan_timesharded`
    plugs in here for the time-sharded mesh mode (backward_mode
    "timeshard")."""
    from ..backward import BackwardResult, Gains
    from ..ops.ldlt import ldlt_factor_pivoted, ldlt_solve_refined

    nx, nu, nc, T = problem.nx, problem.nu, problem.nc, problem.T
    c_rel, il, iu, phi, zl, zu = nominal
    dtype = il.dtype
    zero = jnp.zeros((), dtype)
    nz = nx + nu

    if lam is None:
        lam = costate_scan(deriv, phi)
    if second is None:
        if options.quasi_newton:
            second = jnp.zeros((T, nz, nz), dtype)
        else:
            second = deriv.cH_phi
            if deriv.fH is not None:
                second = second + jnp.einsum("ti,tijk->tjk", lam[1:],
                                             deriv.fH)

    def assemble(fx, fu, lx, lu, lxx, lux, luu, cx, cu, sec,
                 c_t, il_t, iu_t, phi_t, zl_t, zu_t,
                 Vx_n, Vxx_n, reg, delta_c):
        sl = 1.0 / il_t
        su = 1.0 / iu_t
        sig_l = zl_t * sl
        sig_u = zu_t * su
        Qu = lu + cu.T @ phi_t + fu.T @ Vx_n - mu * sl + mu * su
        fuV = fu.T @ Vxx_n
        H = luu + jnp.diag(sig_l + sig_u) + fuV @ fu
        Bm = lux + fuV @ fx
        if not options.quasi_newton:
            Bm = Bm + sec[nx:, :nx]
            H = H + sec[nx:, nx:]
        H = H + reg * jnp.eye(nu, dtype=dtype)
        m = nu + nc
        K = jnp.zeros((m, m), dtype)
        K = K.at[:nu, :nu].set(H)
        if nc > 0:
            K = K.at[:nu, nu:].set(cu.T)
            K = K.at[nu:, :nu].set(cu)
            K = K.at[nu:, nu:].set(-delta_c * jnp.eye(nc, dtype=dtype))
        rhs = jnp.concatenate(
            [jnp.concatenate([-Qu[:, None], -Bm], axis=1),
             jnp.concatenate([-c_t[:, None], -cx], axis=1)], axis=0)
        return K, rhs, Qu, sig_l, sig_u, sl, su

    def batched_kkt_solve(K, rhs):
        """[T, m, m] systems -> (X, ok, singular), XLA vmapped LDLT."""
        def one(K_t, rhs_t):
            factors = ldlt_factor_pivoted(K_t, unroll=options.ldlt_unroll)
            X, solve_ok = ldlt_solve_refined(
                factors, K_t, rhs_t, refine_steps=options.refine_steps,
                check_residual=True,
                residual_rtol=options.kkt_residual_rtol)
            ok = factors.ok & (factors.n_pos == nu) & solve_ok
            return X, ok, factors.n_zero > 0

        return jax.vmap(one)(K, rhs)

    vscan = value_scan or parallel_value_scan

    def attempt(reg, delta_c):
        elems = _stage_blocks(problem, deriv, nominal, mu, second,
                              reg, delta_c, options)
        Vx_next, Vxx_next = vscan(problem, elems, deriv.lTx, deriv.lTxx)
        K, rhs, Qu, sig_l, sig_u, sl, su = jax.vmap(
            assemble, in_axes=(0,) * 18 + (None, None))(
            deriv.fx, deriv.fu,
            deriv.lx, deriv.lu, deriv.lxx, deriv.lux, deriv.luu,
            deriv.cx, deriv.cu, second,
            c_rel, il, iu, phi, zl, zu,
            Vx_next, Vxx_next, reg, delta_c)
        X, ok, singular = batched_kkt_solve(K, rhs)
        alpha, beta = X[:, :nu, 0], X[:, :nu, 1:]
        psi, omega = X[:, nu:, 0], X[:, nu:, 1:]
        chi_l = mu * sl - zl - sig_l * alpha
        zeta_l = -sig_l[..., None] * beta
        chi_u = mu * su - zu + sig_u * alpha
        zeta_u = sig_u[..., None] * beta
        gains = Gains(alpha, beta, psi, omega, chi_l, zeta_l, chi_u, zeta_u)
        dL_t = (jnp.einsum("tu,tu->t", Qu, alpha)
                + jnp.einsum("tc,tc->t", c_rel, psi))
        fail = ~jnp.all(ok)
        # reference semantics: delta_c latches from the first failing stage
        # (reference: src/inertia_correction.jl:263-265); here "first" is the
        # latest-in-time failing stage of the reverse sweep
        fail_rev = jnp.flip(~ok)
        first_fail = jnp.argmax(fail_rev)
        singular_first = jnp.flip(singular)[first_fail] & fail
        return gains, jnp.sum(dL_t), fail, singular_first

    init = attempt(zero, zero)

    def next_reg(reg):
        first = jnp.where(
            reg_last == 0.0, jnp.asarray(options.reg_1, dtype),
            jnp.maximum(options.reg_min, options.kappa_w_minus * reg_last))
        bumped = jnp.where(reg_last == 0.0, options.kappa_w_plus_bar * reg,
                           options.kappa_w_plus * reg)
        return jnp.where(reg == 0.0, first, bumped)

    # Clamp reg_max to the working dtype's finite max (the reference default
    # 1e40 overflows to inf when cast to f32, which would make the guard
    # vacuous) — computed in Python to avoid the overflow-on-cast warning.
    reg_max = jnp.asarray(min(options.reg_max, float(jnp.finfo(dtype).max)),
                          dtype)

    def cond(carry):
        reg, _, _, _, fail, _, n = carry
        # Stop once the reg the *next* attempt would use exceeds reg_max —
        # the reference never factorizes above reg_max
        # (reference: src/backward_pass.jl:55).
        return (fail & (next_reg(reg) <= reg_max)
                & (n < options.max_backward_restarts))

    def body(carry):
        reg, delta_c, gains, dL, fail, singular, n = carry
        delta_c_new = jnp.where(
            singular, jnp.asarray(options.delta_c, dtype) * mu ** options.kappa_c,
            delta_c)
        reg_new = next_reg(reg)
        gains, dL, fail, singular = attempt(reg_new, delta_c_new)
        return (reg_new, delta_c_new, gains, dL, fail, singular, n + 1)

    carry = (zero, zero, init[0], init[1], init[2], init[3], jnp.int32(0))
    reg, delta_c, gains, dL, fail, singular, _ = jax.lax.while_loop(
        cond, body, carry)

    status = jnp.where(fail, jnp.int32(1), jnp.int32(0))
    return BackwardResult(gains=gains, lam=lam, dL=dL, status=status,
                          reg=reg, delta_c=delta_c)


def parallel_value_scan(problem: Problem, elements: ValueElement,
                        lTx, lTxx):
    """Suffix value functions V_{t+1} for every stage via associative scan.

    Returns (Vx [T, nx], Vxx [T, nx, nx]) where entry t is the value at stage
    t+1 (what the stage-t KKT needs), i.e. V_{T} = terminal for t = T-1."""
    T = problem.T
    term = ValueElement(
        A=jnp.zeros_like(elements.A[0]),
        b=jnp.zeros_like(elements.b[0]),
        C=jnp.zeros_like(elements.C[0]),
        eta=-lTx,
        J=lTxx,
    )
    # reverse-time ordering: index 0 = stage T-1's element
    rev = jax.tree.map(lambda a: jnp.flip(a, axis=0), elements)
    # prepend the terminal element, drop the earliest stage's element (its
    # composition gives V_0 which nothing consumes)
    seq = jax.tree.map(lambda t_, r: jnp.concatenate([t_[None], r[:-1]]),
                       term, rev)
    acc = jax.lax.associative_scan(combine, seq, reverse=False)
    # acc[k] composes stages T-1-k+1..T-1 with the terminal: V_{T-k}
    Vxx_rev, Vx_rev = acc.J, -acc.eta
    Vxx = jnp.flip(Vxx_rev, axis=0)    # entry t = V_{t+1}
    Vx = jnp.flip(Vx_rev, axis=0)
    return Vx, Vxx
