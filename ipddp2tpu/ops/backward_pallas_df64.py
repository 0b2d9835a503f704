"""Pallas TPU megakernel for the f64 ENDGAME: the backward sweep in
double-single (df64) arithmetic.

The mixed-precision pipeline runs f32 to ~3e-4 and must finish to 1e-7 KKT
error in higher precision (f32 eps 6e-8 cannot certify 1e-7; the KKT systems
are graded with Sigma ~ 1e10 near convergence). XLA's f64-on-TPU emulation
keeps the scan path's latency-bound dispatch chain and costs ~seconds per
batch-iteration; this kernel instead runs the SAME fused sweep as
`backward_pallas.py` (grid over time, batch on lanes, value carry in VMEM)
with every arithmetic op in df64 (`ops/df64.py`, unit roundoff 2^-48) — the
TPU-native equivalent of the reference's LAPACK-f64 backward pass
(reference: src/backward_pass.jl:58-189, src/inertia_correction.jl:257-276).

Numerical adequacy: diagonal-pivoted LDL^T + one refinement pass needs
eps * cond << 1 for its residual gate; cond ~ kappa_Sigma = 1e10 and
eps_df64 = 3.6e-15 give 4e-5, the same regime the CPU f64 path certifies.
Pivot SELECTION and the inertia sign counts use hi words only (any
reasonable pivot order is valid; signs at the 2^-24 level are far above the
inertia tolerance).

In/out layout: each per-stage block carries a leading size-2 axis holding
(hi, lo); the caller splits f64 arrays with `df64.from_f64` and reassembles
with `to_f64`. Parity vs the XLA f64 scan path is pinned by
tests/test_backward_pallas_df64.py (interpret mode).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import df64 as dd
from .df64 import DF

F32 = jnp.float32


def _df(ref_slot):
    """Load a (2, ...) block slot into a DF pair."""
    return DF(ref_slot[0], ref_slot[1])


def _sumr(xs):
    """df64 sum of a Python list of DF values."""
    acc = xs[0]
    for x in xs[1:]:
        acc = dd.add(acc, x)
    return acc


def _dot(a_list, b_list):
    return _sumr([dd.mul(a, b) for a, b in zip(a_list, b_list)])


def _ldlt_solve_lanes_df(A0, rhs, *, m, refine, rtol):
    """df64 twin of backward_pallas._ldlt_solve_lanes.

    A0: DF [m, m, B]; rhs: DF [m, nk, B]. Implicit max-|diagonal| pivoting
    (pivot choice on hi words). Returns (X DF, n_pos, n_zero, finite [B],
    solve_ok [B]); the residual gate uses the caller's rtol
    (options.kkt_residual_rtol — same semantics as the f64 scan path's
    ldlt_solve_refined gate).
    """
    B = A0.hi.shape[-1]
    A = A0
    eliminated = jnp.zeros((m, B), dtype=jnp.bool_)
    row_f = jax.lax.broadcasted_iota(jnp.int32, (m, B), 0).astype(F32)

    one = jnp.ones((), F32)
    zero = jnp.zeros((), F32)
    b2f = lambda p: jnp.where(p, one, zero)

    onehots, lcols, ds = [], [], []
    for j in range(m):
        diag = DF(jnp.stack([A.hi[i, i, :] for i in range(m)], axis=0),
                  jnp.stack([A.lo[i, i, :] for i in range(m)], axis=0))
        cand = jnp.where(eliminated, jnp.asarray(float("-inf"), F32),
                         jnp.abs(diag.hi))
        mx = jnp.max(cand, axis=0)
        eqm = cand == mx[None, :]
        ridx = jnp.min(jnp.where(eqm, row_f, jnp.asarray(float(m), F32)),
                       axis=0)
        onehot = row_f == ridx[None, :]                            # [m, B]
        pick = lambda v: jnp.sum(jnp.where(onehot, v, zero), axis=0)
        d_j = DF(pick(diag.hi), pick(diag.lo))                     # [B]

        colh = jnp.zeros_like(diag.hi)
        coll = jnp.zeros_like(diag.lo)
        for i in range(m):
            colh = colh + jnp.where(onehot[i][None, :], A.hi[:, i, :], zero)
            coll = coll + jnp.where(onehot[i][None, :], A.lo[:, i, :], zero)
        col = DF(colh, coll)
        dsafe = dd.where(d_j.hi == 0.0, DF(jnp.ones_like(d_j.hi),
                                           jnp.zeros_like(d_j.lo)), d_j)
        l = dd.div(col, DF(dsafe.hi[None, :] + jnp.zeros_like(colh),
                           dsafe.lo[None, :] + jnp.zeros_like(coll)))
        kill = eliminated | onehot
        l = dd.where(kill, dd.zeros_like(l), l)                    # [m, B]

        dl = dd.mul(l, DF(d_j.hi[None, :] + jnp.zeros_like(l.hi),
                          d_j.lo[None, :] + jnp.zeros_like(l.lo)))
        # A -= dl[:, None, :] * l[None, :, :]  (rank-1, df64)
        upd = dd.mul(DF(dl.hi[:, None, :] + jnp.zeros_like(A.hi),
                        dl.lo[:, None, :] + jnp.zeros_like(A.lo)),
                     DF(l.hi[None, :, :] + jnp.zeros_like(A.hi),
                        l.lo[None, :, :] + jnp.zeros_like(A.lo)))
        A = dd.sub(A, upd)

        onehots.append(onehot)
        lcols.append(l)
        ds.append(d_j)
        eliminated = kill

    dh = jnp.stack([d.hi for d in ds], axis=0)                     # [m, B]
    n_pos = jnp.sum(b2f(dh > 0.0), axis=0).astype(jnp.int32)
    n_zero = jnp.sum(b2f(dh == 0.0), axis=0).astype(jnp.int32)
    finite = jnp.sum(b2f(~jnp.isfinite(dh)), axis=0) == 0.0

    def solve(b: DF) -> DF:
        res = b
        z = []
        for j in range(m):              # forward: z = W^{-1} b
            oh = onehots[j][:, None, :]
            zj = DF(jnp.sum(jnp.where(oh, res.hi, zero), axis=0),
                    jnp.sum(jnp.where(oh, res.lo, zero), axis=0))  # [nk, B]
            w = DF(b2f(onehots[j]) + lcols[j].hi, lcols[j].lo)     # [m, B]
            res = dd.sub(res, dd.mul(
                DF(w.hi[:, None, :] + jnp.zeros_like(res.hi),
                   w.lo[:, None, :] + jnp.zeros_like(res.lo)),
                DF(zj.hi[None, :, :] + jnp.zeros_like(res.hi),
                   zj.lo[None, :, :] + jnp.zeros_like(res.lo))))
            z.append(zj)
        x = dd.zeros_like(b)
        for j in range(m - 1, -1, -1):  # backward: W^T x = D^{-1} z
            dj = ds[j]
            dsafe = dd.where(dj.hi == 0.0,
                             DF(jnp.ones_like(dj.hi), jnp.zeros_like(dj.lo)),
                             dj)
            lj = lcols[j]
            # df64 sum_i l[i] * x[i]
            terms_h = jnp.zeros_like(x.hi[0])
            acc = DF(terms_h, jnp.zeros_like(terms_h))
            for i in range(m):
                acc = dd.add(acc, dd.mul(
                    DF(lj.hi[i][None, :] + jnp.zeros_like(x.hi[i]),
                       lj.lo[i][None, :] + jnp.zeros_like(x.lo[i])),
                    DF(x.hi[i], x.lo[i])))
            rhs_j = dd.sub(dd.div(z[j], DF(
                dsafe.hi[None, :] + jnp.zeros_like(z[j].hi),
                dsafe.lo[None, :] + jnp.zeros_like(z[j].lo))), acc)
            oh = onehots[j][:, None, :]
            x = DF(x.hi + jnp.where(oh, rhs_j.hi[None, :, :], zero),
                   x.lo + jnp.where(oh, rhs_j.lo[None, :, :], zero))
        return x

    def matvec(x: DF) -> DF:
        acc = dd.zeros_like(x)
        for i in range(m):
            acc = dd.add(acc, dd.mul(
                DF(A0.hi[:, i, :][:, None, :] + jnp.zeros_like(x.hi),
                   A0.lo[:, i, :][:, None, :] + jnp.zeros_like(x.lo)),
                DF(x.hi[i][None, :, :] + jnp.zeros_like(x.hi),
                   x.lo[i][None, :, :] + jnp.zeros_like(x.lo))))
        return acc

    x = solve(rhs)
    for _ in range(refine):
        x = dd.add(x, solve(dd.sub(rhs, matvec(x))))

    # residual gate (df64 quantities, hi-word norms are plenty)
    r = dd.sub(rhs, matvec(x))
    ssq = lambda ah: jnp.sqrt(jnp.sum(jnp.sum(ah * ah, axis=0), axis=0))
    nr = ssq(r.hi)
    na = ssq(A0.hi)
    nx_ = ssq(x.hi)
    nb = ssq(rhs.hi)
    x_finite = jnp.sum(jnp.sum(
        b2f(~jnp.isfinite(x.hi)), axis=0), axis=0) == 0.0
    solve_ok = (nr <= jnp.asarray(rtol, F32) * (na * nx_ + nb)) & x_finite
    return x, n_pos, n_zero, finite, solve_ok


def _bc(v: DF, like_hi):
    """Broadcast a DF of shape s to `like_hi`'s shape by +0 (Mosaic-safe)."""
    z = jnp.zeros_like(like_hi)
    return DF(v.hi + z, v.lo + z)


def _kernel(scal_ref, lTx_ref, lTxx_ref,
            fx_ref, fu_ref, lx_ref, lu_ref, lxx_ref, lux_ref, luu_ref,
            cx_ref, cu_ref, sec_ref, c_ref, il_ref, iu_ref,
            phi_ref, zl_ref, zu_ref,
            alpha_ref, beta_ref, psi_ref, omega_ref,
            chi_l_ref, zeta_l_ref, chi_u_ref, zeta_u_ref,
            dL_ref, flags_ref,
            Vx_s, Vxx_s,
            *, nx, nu, nc, refine, rtol):
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _init():
        Vx_s[...] = lTx_ref[...]
        Vxx_s[...] = lTxx_ref[...]
        dL_ref[0, :] = jnp.zeros((dL_ref.shape[1],), dL_ref.dtype)
        dL_ref[1, :] = jnp.zeros((dL_ref.shape[1],), dL_ref.dtype)
        flags_ref[...] = jnp.zeros(flags_ref.shape, flags_ref.dtype)

    mu = DF(scal_ref[0, :], scal_ref[1, :])          # [B]
    reg = DF(scal_ref[2, :], scal_ref[3, :])
    dc = DF(scal_ref[4, :], scal_ref[5, :])

    Vx = DF(Vx_s[0], Vx_s[1])                        # [nx, B]
    Vxx = DF(Vxx_s[0], Vxx_s[1])                     # [nx, nx, B]

    fx = _df(fx_ref[0])                              # [nx, nx, B]
    fu = _df(fu_ref[0])                              # [nx, nu, B]
    lx = _df(lx_ref[0])
    lu = _df(lu_ref[0])
    lxx = _df(lxx_ref[0])
    lux = _df(lux_ref[0])
    luu = _df(luu_ref[0])
    sec = _df(sec_ref[0])                            # [nz, nz, B]
    il_t = _df(il_ref[0])                            # [nu, B]
    iu_t = _df(iu_ref[0])
    zl_t = _df(zl_ref[0])
    zu_t = _df(zu_ref[0])

    row = lambda a, k: DF(a.hi[k], a.lo[k])
    one_df = lambda like: DF(jnp.ones_like(like), jnp.zeros_like(like))

    # 1/il with sl = 0 on infinite bounds (df64.div's correction term would
    # produce 0*inf = NaN there; select the clean zero instead)
    fin_l = jnp.isfinite(il_t.hi)
    fin_u = jnp.isfinite(iu_t.hi)
    safe_il = dd.where(fin_l, il_t, one_df(il_t.hi))
    safe_iu = dd.where(fin_u, iu_t, one_df(iu_t.hi))
    sl = dd.where(fin_l, dd.div(one_df(il_t.hi), safe_il),
                  dd.zeros_like(il_t))
    su = dd.where(fin_u, dd.div(one_df(iu_t.hi), safe_iu),
                  dd.zeros_like(iu_t))
    sig_l = dd.mul(zl_t, sl)
    sig_u = dd.mul(zu_t, su)

    mu_b = _bc(mu, sl.hi)
    Qu = dd.add(dd.sub(lu, dd.mul(mu_b, sl)), dd.mul(mu_b, su))
    for k in range(nx):
        Qu = dd.add(Qu, dd.mul(row(fu, k), _bc(row(Vx, k), row(fu, k).hi)))
    if nc > 0:
        cx = _df(cx_ref[0])                          # [nc, nx, B]
        cu = _df(cu_ref[0])                          # [nc, nu, B]
        c_t = _df(c_ref[0])                          # [nc, B]
        phi_t = _df(phi_ref[0])
        for cc in range(nc):
            Qu = dd.add(Qu, dd.mul(row(cu, cc),
                                   _bc(row(phi_t, cc), row(cu, cc).hi)))

    # fuV = fu' Vxx [nu, nx, B]; fxV = fx' Vxx [nx, nx, B]
    zz = lambda *s: DF(jnp.zeros(s + Qu.hi.shape[-1:], F32),
                       jnp.zeros(s + Qu.hi.shape[-1:], F32))
    fuV = zz(nu, nx)
    fxV = zz(nx, nx)
    for k in range(nx):
        fu_k = DF(fu.hi[k][:, None, :] + jnp.zeros_like(fuV.hi),
                  fu.lo[k][:, None, :] + jnp.zeros_like(fuV.lo))
        fx_k = DF(fx.hi[k][:, None, :] + jnp.zeros_like(fxV.hi),
                  fx.lo[k][:, None, :] + jnp.zeros_like(fxV.lo))
        Vk = row(Vxx, k)
        fuV = dd.add(fuV, dd.mul(fu_k, DF(
            Vk.hi[None, :, :] + jnp.zeros_like(fuV.hi),
            Vk.lo[None, :, :] + jnp.zeros_like(fuV.lo))))
        fxV = dd.add(fxV, dd.mul(fx_k, DF(
            Vk.hi[None, :, :] + jnp.zeros_like(fxV.hi),
            Vk.lo[None, :, :] + jnp.zeros_like(fxV.lo))))

    sub2 = lambda a, r0, r1, c0, c1: DF(a.hi[r0:r1, c0:c1], a.lo[r0:r1, c0:c1])
    C = dd.add(lxx, sub2(sec, 0, nx, 0, nx))
    H = dd.add(luu, sub2(sec, nx, nx + nu, nx, nx + nu))
    Bm = dd.add(lux, sub2(sec, nx, nx + nu, 0, nx))
    for k in range(nx):
        fxVk = DF(fxV.hi[:, k, :][:, None, :], fxV.lo[:, k, :][:, None, :])
        fuVk = DF(fuV.hi[:, k, :][:, None, :], fuV.lo[:, k, :][:, None, :])
        fxk = DF(fx.hi[k][None, :, :], fx.lo[k][None, :, :])
        fuk = DF(fu.hi[k][None, :, :], fu.lo[k][None, :, :])
        C = dd.add(C, dd.mul(DF(fxVk.hi + jnp.zeros_like(C.hi),
                                fxVk.lo + jnp.zeros_like(C.lo)),
                             DF(fxk.hi + jnp.zeros_like(C.hi),
                                fxk.lo + jnp.zeros_like(C.lo))))
        H = dd.add(H, dd.mul(DF(fuVk.hi + jnp.zeros_like(H.hi),
                                fuVk.lo + jnp.zeros_like(H.lo)),
                             DF(fuk.hi + jnp.zeros_like(H.hi),
                                fuk.lo + jnp.zeros_like(H.lo))))
        Bm = dd.add(Bm, dd.mul(DF(fuVk.hi + jnp.zeros_like(Bm.hi),
                                  fuVk.lo + jnp.zeros_like(Bm.lo)),
                               DF(fxk.hi + jnp.zeros_like(Bm.hi),
                                  fxk.lo + jnp.zeros_like(Bm.lo))))

    r_i = jax.lax.broadcasted_iota(jnp.int32, (nu, nu), 0)
    c_i = jax.lax.broadcasted_iota(jnp.int32, (nu, nu), 1)
    eye_nu = jnp.where(r_i == c_i, jnp.ones((), F32), jnp.zeros((), F32))
    diag_term = dd.add(dd.add(sig_l, sig_u), _bc(reg, sig_l.hi))
    # multiply by the 0/1 eye is exact componentwise; the ADD must be a df64
    # add (componentwise hi+hi drops the hi-sum rounding -> f32-level error)
    H = dd.add(H, DF(eye_nu[:, :, None] * diag_term.hi[:, None, :],
                     eye_nu[:, :, None] * diag_term.lo[:, None, :]))

    m = nu + nc
    # KKT assembly: K = [H cu'; cu -dc I], rhs = -[Qu Bm; c cx]
    if nc > 0:
        cuT = DF(jnp.transpose(cu.hi, (1, 0, 2)),
                 jnp.transpose(cu.lo, (1, 0, 2)))
        rc_i = jax.lax.broadcasted_iota(jnp.int32, (nc, nc), 0)
        cc_i = jax.lax.broadcasted_iota(jnp.int32, (nc, nc), 1)
        eye_nc = jnp.where(rc_i == cc_i, jnp.ones((), F32),
                           jnp.zeros((), F32))
        dcI = DF(eye_nc[:, :, None] * dc.hi[None, None, :],
                 eye_nc[:, :, None] * dc.lo[None, None, :])
        cat = lambda a, b, ax: DF(jnp.concatenate([a.hi, b.hi], axis=ax),
                                  jnp.concatenate([a.lo, b.lo], axis=ax))
        K = cat(cat(H, cuT, 1), cat(cu, dd.neg(dcI), 1), 0)
        rhs = cat(cat(DF(Qu.hi[:, None, :], Qu.lo[:, None, :]), Bm, 1),
                  cat(DF(c_t.hi[:, None, :], c_t.lo[:, None, :]), cx, 1), 0)
    else:
        K = H
        rhs = DF(jnp.concatenate([Qu.hi[:, None, :], Bm.hi], axis=1),
                 jnp.concatenate([Qu.lo[:, None, :], Bm.lo], axis=1))
    rhs = dd.neg(rhs)

    X, n_pos, n_zero, finite, solve_ok = _ldlt_solve_lanes_df(
        K, rhs, m=m, refine=refine, rtol=rtol)

    alpha = DF(X.hi[:nu, 0, :], X.lo[:nu, 0, :])     # [nu, B]
    beta = DF(X.hi[:nu, 1:, :], X.lo[:nu, 1:, :])    # [nu, nx, B]

    chi_l = dd.sub(dd.sub(dd.mul(mu_b, sl), zl_t), dd.mul(sig_l, alpha))
    chi_u = dd.add(dd.sub(dd.mul(mu_b, su), zu_t), dd.mul(sig_u, alpha))
    sig_l3 = DF(sig_l.hi[:, None, :] + jnp.zeros_like(beta.hi),
                sig_l.lo[:, None, :] + jnp.zeros_like(beta.lo))
    sig_u3 = DF(sig_u.hi[:, None, :] + jnp.zeros_like(beta.hi),
                sig_u.lo[:, None, :] + jnp.zeros_like(beta.lo))
    zeta_l = dd.neg(dd.mul(sig_l3, beta))
    zeta_u = dd.mul(sig_u3, beta)

    # Value recursion + expected decrease
    Vxx_n = C
    for k in range(nu):
        bk = DF(beta.hi[k][:, None, :], beta.lo[k][:, None, :])
        Bk = DF(Bm.hi[k][None, :, :], Bm.lo[k][None, :, :])
        Vxx_n = dd.add(Vxx_n, dd.mul(
            DF(bk.hi + jnp.zeros_like(Vxx_n.hi),
               bk.lo + jnp.zeros_like(Vxx_n.lo)),
            DF(Bk.hi + jnp.zeros_like(Vxx_n.hi),
               Bk.lo + jnp.zeros_like(Vxx_n.lo))))
    Vx_n = lx
    bQ = _dot([row(beta, k) for k in range(nu)],
              [_bc(row(Qu, k), row(beta, k).hi) for k in range(nu)])
    Vx_n = dd.add(Vx_n, bQ)
    for k in range(nx):
        Vx_n = dd.add(Vx_n, dd.mul(row(fx, k), _bc(row(Vx, k),
                                                   row(fx, k).hi)))
    dL_new = _dot([row(Qu, k) for k in range(nu)],
                  [row(alpha, k) for k in range(nu)])
    if nc > 0:
        psi = DF(X.hi[nu:, 0, :], X.lo[nu:, 0, :])
        omega = DF(X.hi[nu:, 1:, :], X.lo[nu:, 1:, :])
        for cc in range(nc):
            ok_ = DF(omega.hi[cc][:, None, :], omega.lo[cc][:, None, :])
            cxk = DF(cx.hi[cc][None, :, :], cx.lo[cc][None, :, :])
            Vxx_n = dd.add(Vxx_n, dd.mul(
                DF(ok_.hi + jnp.zeros_like(Vxx_n.hi),
                   ok_.lo + jnp.zeros_like(Vxx_n.lo)),
                DF(cxk.hi + jnp.zeros_like(Vxx_n.hi),
                   cxk.lo + jnp.zeros_like(Vxx_n.lo))))
            Vx_n = dd.add(Vx_n, dd.mul(row(cx, cc),
                                       _bc(row(phi_t, cc), row(cx, cc).hi)))
            Vx_n = dd.add(Vx_n, dd.mul(row(omega, cc),
                                       _bc(row(c_t, cc), row(omega, cc).hi)))
        dL_new = dd.add(dL_new, _dot([row(c_t, cc) for cc in range(nc)],
                                     [row(psi, cc) for cc in range(nc)]))
        psi_ref[0, 0] = psi.hi
        psi_ref[0, 1] = psi.lo
        omega_ref[0, 0] = omega.hi
        omega_ref[0, 1] = omega.lo
    # Symmetrize (see backward.py: roundoff asymmetry amplifies per stage)
    VT = DF(jnp.transpose(Vxx_n.hi, (1, 0, 2)),
            jnp.transpose(Vxx_n.lo, (1, 0, 2)))
    half = DF(jnp.full_like(Vxx_n.hi, 0.5), jnp.zeros_like(Vxx_n.lo))
    Vxx_n = dd.mul(half, dd.add(Vxx_n, VT))

    alpha_ref[0, 0], alpha_ref[0, 1] = alpha.hi, alpha.lo
    beta_ref[0, 0], beta_ref[0, 1] = beta.hi, beta.lo
    chi_l_ref[0, 0], chi_l_ref[0, 1] = chi_l.hi, chi_l.lo
    zeta_l_ref[0, 0], zeta_l_ref[0, 1] = zeta_l.hi, zeta_l.lo
    chi_u_ref[0, 0], chi_u_ref[0, 1] = chi_u.hi, chi_u.lo
    zeta_u_ref[0, 0], zeta_u_ref[0, 1] = zeta_u.hi, zeta_u.lo

    Vx_s[0], Vx_s[1] = Vx_n.hi, Vx_n.lo
    Vxx_s[0], Vxx_s[1] = Vxx_n.hi, Vxx_n.lo
    dL_acc = dd.add(DF(dL_ref[0, :], dL_ref[1, :]), dL_new)
    dL_ref[0, :] = dL_acc.hi
    dL_ref[1, :] = dL_acc.lo

    stage_ok = finite & (n_zero == 0) & (n_pos == nu) & solve_ok
    prev_fail = flags_ref[0, :]
    first_fail = (prev_fail == 0) & (~stage_ok)
    i32_one = jnp.ones((), jnp.int32)
    i32_zero = jnp.zeros((), jnp.int32)
    flags_ref[1, :] = flags_ref[1, :] | jnp.where(
        first_fail & (n_zero > 0), i32_one, i32_zero)
    flags_ref[0, :] = prev_fail | jnp.where(~stage_ok, i32_one, i32_zero)


@partial(jax.jit, static_argnames=("nx", "nu", "nc", "refine", "rtol",
                                   "tile_b", "interpret"))
def backward_sweep_pallas_df64(
        fx, fu, lx, lu, lxx, lux, luu, cx, cu, sec,
        c_rel, il, iu, phi, zl, zu, lTx, lTxx, mu, reg, delta_c,
        *, nx, nu, nc, refine, rtol, tile_b=128, interpret=None):
    """f64-in, f64-out batched backward sweep via the df64 megakernel.

    Same signature/semantics as `backward_pallas.backward_sweep_pallas`
    but inputs/outputs are float64 ([B, T, ...]); each array is split into
    an (hi, lo) f32 pair on the XLA side around the kernel.
    """
    from . import df64 as dd_mod

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, T = fx.shape[0], fx.shape[1]
    nz = nx + nu
    nk = nx + 1
    nc1 = max(nc, 1)

    tile_b = min(tile_b, B)
    pad = (-B) % tile_b
    if pad:
        padded = lambda a: jnp.pad(a, [(0, pad)] + [(0, 0)] * (a.ndim - 1),
                                   mode="edge")
    else:
        padded = lambda a: a
    Bp = B + pad

    def tl_t(a):            # time-indexed blocks
        d = dd_mod.from_f64(jnp.moveaxis(padded(a), 0, -1))  # [T, ..., B]
        return jnp.stack([d.hi, d.lo], axis=1)               # [T, 2, ..., B]

    def tl_c(a):            # constants (no time axis)
        d = dd_mod.from_f64(jnp.moveaxis(padded(a), 0, -1))  # [..., B]
        return jnp.stack([d.hi, d.lo], axis=0)               # [2, ..., B]

    zt = lambda *dims: jnp.zeros((B, T) + dims, jnp.float64)

    scal64 = jnp.stack([mu, reg, delta_c], axis=0)           # [3, B]
    scal64 = padded(scal64.T).T if pad else scal64
    sd = dd_mod.from_f64(scal64)
    scal = jnp.concatenate(
        [jnp.stack([sd.hi[i], sd.lo[i]]) for i in range(3)], axis=0)  # [6, B]

    import numpy as np
    Tm1 = np.int32(T - 1)
    zero32 = np.int32(0)

    def t_spec(*dims):
        block = (1, 2) + dims + (tile_b,)
        zeros = (zero32,) * len(dims)
        return pl.BlockSpec(block, lambda b, i: (Tm1 - i, zero32, *zeros, b),
                            memory_space=pltpu.VMEM)

    def const_spec(lead, *dims):
        block = (lead,) + dims + (tile_b,)
        zeros = (zero32,) * len(dims)
        return pl.BlockSpec(block, lambda b, i: (zero32, *zeros, b),
                            memory_space=pltpu.VMEM)

    in_specs = [
        const_spec(6),                   # scal (3 df64 scalars)
        const_spec(2, nx),               # lTx
        const_spec(2, nx, nx),           # lTxx
        t_spec(nx, nx),                  # fx
        t_spec(nx, nu),                  # fu
        t_spec(nx),                      # lx
        t_spec(nu),                      # lu
        t_spec(nx, nx),                  # lxx
        t_spec(nu, nx),                  # lux
        t_spec(nu, nu),                  # luu
        t_spec(nc1, nx),                 # cx
        t_spec(nc1, nu),                 # cu
        t_spec(nz, nz),                  # sec
        t_spec(nc1),                     # c
        t_spec(nu),                      # il
        t_spec(nu),                      # iu
        t_spec(nc1),                     # phi
        t_spec(nu),                      # zl
        t_spec(nu),                      # zu
    ]
    out_specs = (
        t_spec(nu),                      # alpha
        t_spec(nu, nx),                  # beta
        t_spec(nc1),                     # psi
        t_spec(nc1, nx),                 # omega
        t_spec(nu),                      # chi_l
        t_spec(nu, nx),                  # zeta_l
        t_spec(nu),                      # chi_u
        t_spec(nu, nx),                  # zeta_u
        const_spec(2),                   # dL (df64 accumulator)
        const_spec(2),                   # flags (fail, singular) i32
    )
    # propagate the inputs' varying-mesh-axes so shard_map's check_vma
    # accepts the pallas_call out_shape (outputs are per-shard like inputs)
    vma = getattr(jax.typeof(fx), "vma", frozenset())
    sds = lambda *dims: jax.ShapeDtypeStruct((T, 2) + dims + (Bp,), F32,
                                             vma=vma)
    out_shape = (
        sds(nu), sds(nu, nx), sds(nc1), sds(nc1, nx),
        sds(nu), sds(nu, nx), sds(nu), sds(nu, nx),
        jax.ShapeDtypeStruct((2, Bp), F32, vma=vma),
        jax.ShapeDtypeStruct((2, Bp), jnp.int32, vma=vma),
    )

    args = (
        scal,
        tl_c(lTx), tl_c(lTxx),
        tl_t(fx), tl_t(fu), tl_t(lx), tl_t(lu), tl_t(lxx), tl_t(lux),
        tl_t(luu),
        tl_t(cx) if nc > 0 else tl_t(zt(nc1, nx)),
        tl_t(cu) if nc > 0 else tl_t(zt(nc1, nu)),
        tl_t(sec),
        tl_t(c_rel) if nc > 0 else tl_t(zt(nc1)),
        tl_t(il), tl_t(iu),
        tl_t(phi) if nc > 0 else tl_t(zt(nc1)),
        tl_t(zl), tl_t(zu),
    )

    nb = Bp // tile_b
    outs = pl.pallas_call(
        partial(_kernel, nx=nx, nu=nu, nc=nc, refine=refine, rtol=rtol),
        grid=(nb, T),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((2, nx, tile_b), F32),        # Vx carry (df64)
            pltpu.VMEM((2, nx, nx, tile_b), F32),    # Vxx carry (df64)
        ],
        interpret=bool(interpret),
    )(*args)

    (alpha, beta, psi, omega, chi_l, zeta_l, chi_u, zeta_u,
     dL, flags) = outs

    def fb(a):               # [T, 2, ..., Bp] -> [B, T, ...] f64
        v = dd_mod.to_f64(dd_mod.DF(a[:, 0], a[:, 1]))
        return jnp.moveaxis(v, -1, 0)[:B]

    gains = (fb(alpha), fb(beta),
             fb(psi)[:, :, :nc], fb(omega)[:, :, :nc],
             fb(chi_l), fb(zeta_l), fb(chi_u), fb(zeta_u))
    dL64 = dd_mod.to_f64(dd_mod.DF(dL[0], dL[1]))[:B]
    return gains, dL64, flags[0, :B] > 0, flags[1, :B] > 0
