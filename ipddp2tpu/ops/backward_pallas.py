"""Pallas TPU megakernel: the ENTIRE backward sweep in one kernel launch.

Round-1 measurement (docs/PERF.md, CLAUDE.md): the sequential `lax.scan`
backward pass is latency-bound on TPU — ~100 stages x ~150 tiny XLA ops per
stage (KKT assembly + factorization loop) is tens of thousands of kernel
dispatches inside the device program, ~3 ms per stage at batch 64 where the
arithmetic itself is microseconds. This kernel removes that wall: one
`pallas_call` executes the whole reverse-time recursion (reference:
src/backward_pass.jl:58-189) with

  * grid = (batch_tiles, T): TPU grid execution is sequential with the last
    dimension innermost, so the value-function carry (Vx, Vxx) lives in VMEM
    scratch and persists across time steps; per-stage derivative blocks
    stream HBM->VMEM through the automatic Pallas pipeline (double-buffered);
  * batch-on-lanes layout [stage-dims..., B]: every arithmetic op in the
    stage math and the factorization is a full-width vector op across problem
    instances (implicit one-hot diagonal pivoting + refinement + inertia logic,
    the lanes twin of `ops/ldlt.py`);
  * the full per-stage pipeline — Sigma terms, Qu/C/H/B assembly
    (reference: src/backward_pass.jl:62-99), second-order terms, KKT
    factor+inertia+solve (reference: src/inertia_correction.jl:257-276),
    closed-form bound-dual gains (reference: src/backward_pass.jl:152-172),
    value recursion (reference: src/backward_pass.jl:176-189) — happens
    in-register/VMEM with zero HBM roundtrips between steps.

Semantics match `backward._run_pass` (the scan path) bit-for-bit up to
floating-point reassociation: same pivot order (max-|diagonal|), same
refinement count, same backward-stability residual gate, same
fail/singular-at-first-failure bookkeeping. Parity is pinned by
tests/test_backward_pallas.py in interpret mode.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _b2f(pred, dt):
    """bool -> float via select (a direct bool cast lowers through i64
    vector constants in Mosaic, which the TPU layout pass rejects)."""
    return jnp.where(pred, jnp.ones((), dt), jnp.zeros((), dt))


def _eye(n, dt):
    """Identity matrix without jnp.eye (whose iotas are i64 under x64)."""
    r = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    return jnp.where(r == c, jnp.ones((), dt), jnp.zeros((), dt))

def _ldlt_solve_lanes(A0, rhs, *, m, refine, rtol):
    """Batched-on-lanes pivoted LDL^T factor + solve + inertia on values.

    A0: [m, m, B], rhs: [m, nk, B]. Implicit max-|diagonal| pivoting via
    one-hot row masks (no physical swaps — identical pivot sequence to
    `ops.ldlt.ldlt_factor_pivoted`). Returns
    (X [m, nk, B], n_pos [B] i32, n_zero [B] i32, finite [B] bool,
    solve_ok [B] bool).
    """
    B = A0.shape[-1]
    dt = A0.dtype
    A = A0
    eliminated = jnp.zeros((m, B), dtype=jnp.bool_)
    # Mosaic only lowers float reductions reliably; argmax / bool-all /
    # int sums are rewritten as float max/min/sum reductions below.
    # int32 iota cast to float (Mosaic rejects float tpu.iota directly)
    row_f = jax.lax.broadcasted_iota(jnp.int32, (m, B), 0).astype(dt)

    onehots, lcols, ds = [], [], []
    for j in range(m):
        diag = jnp.stack([A[i, i, :] for i in range(m)], axis=0)   # [m, B]
        # all scalar literals pinned to dt: even weak-typed Python floats
        # lower to f64 constants + casts under x64, unsupported in Mosaic
        cand = jnp.where(eliminated, jnp.asarray(float("-inf"), dt),
                         jnp.abs(diag))
        # argmax with first-occurrence tiebreak, via float reductions
        mx = jnp.max(cand, axis=0)                                 # [B]
        eq = cand == mx[None, :]
        ridx = jnp.min(jnp.where(eq, row_f, jnp.asarray(float(m), dt)),
                       axis=0)                                     # [B]
        onehot = row_f == ridx[None, :]                            # [m, B]
        d_j = jnp.sum(jnp.where(onehot, diag, jnp.zeros((), dt)),
                      axis=0)                                      # [B]

        col = jnp.zeros_like(diag)
        for i in range(m):
            col = col + jnp.where(onehot[i][None, :], A[:, i, :],
                                  jnp.zeros((), dt))
        safe_d = jnp.where(d_j == 0.0, jnp.ones((), dt), d_j)
        l = col / safe_d[None, :]
        l = jnp.where(eliminated | onehot, jnp.zeros((), dt), l)   # [m, B]

        dl = l * d_j[None, :]
        A = A - dl[:, None, :] * l[None, :, :]

        onehots.append(onehot)
        lcols.append(l)
        ds.append(d_j)
        eliminated = eliminated | onehot

    d = jnp.stack(ds, axis=0)                                      # [m, B]
    # Float-count reductions (int32/bool reductions are unsupported by
    # Mosaic: "Unsupported element type for the selected reduction"); the
    # counts are exact small integers in float.
    n_pos = jnp.sum(_b2f(d > 0.0, dt), axis=0).astype(jnp.int32)
    n_zero = jnp.sum(_b2f(d == 0.0, dt), axis=0).astype(jnp.int32)
    finite = jnp.sum(_b2f(~jnp.isfinite(d), dt), axis=0) == 0.0

    def solve(b):                       # b: [m, nk, B]
        res = b
        z = []
        for j in range(m):              # forward: z = W^{-1} b
            zj = jnp.sum(jnp.where(onehots[j][:, None, :], res,
                                   jnp.zeros((), res.dtype)),
                         axis=0)        # [nk, B]
            w = _b2f(onehots[j], res.dtype) + lcols[j]
            res = res - w[:, None, :] * zj[None, :, :]
            z.append(zj)
        x = jnp.zeros_like(b)
        for j in range(m - 1, -1, -1):  # backward: W^T x = D^{-1} z
            safe_d = jnp.where(ds[j] == 0.0, jnp.ones((), dt), ds[j])
            rhs_j = z[j] / safe_d[None, :] - jnp.sum(
                lcols[j][:, None, :] * x, axis=0)
            # select, not bool*float (implicit bool casts lower through
            # i64 vector constants the TPU layout pass rejects)
            x = x + jnp.where(onehots[j][:, None, :],
                              rhs_j[None, :, :], jnp.zeros((), dt))
        return x

    def matvec(x):
        ax = jnp.zeros_like(x)
        for i in range(m):
            # NB: no inline-None indexing — `A0[:, i, None, :]` lowers to a
            # 3D lax.gather, which Mosaic cannot lower ("Only 2D gather").
            ax = ax + A0[:, i, :][:, None, :] * x[i][None, :, :]
        return ax

    x = solve(rhs)
    for _ in range(refine):             # fused iterative refinement
        x = x + solve(rhs - matvec(x))

    # Backward-stability gate (matches ops.ldlt.ldlt_solve_refined with
    # check_residual=True: Frobenius norms, rtol * (|A||x| + |b|)).
    r = rhs - matvec(x)
    ssq = lambda a: jnp.sqrt(jnp.sum(jnp.sum(a * a, axis=0), axis=0))
    nr = ssq(r)
    na = ssq(A0)
    nx_ = ssq(x)
    nb = ssq(rhs)
    x_finite = jnp.sum(jnp.sum(
        _b2f(~jnp.isfinite(x), A0.dtype), axis=0), axis=0) == 0.0
    solve_ok = (nr <= rtol * (na * nx_ + nb)) & x_finite
    return x, n_pos, n_zero, finite, solve_ok


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
    dtype = lx_ref.dtype

    @pl.when(i == 0)
    def _init():
        Vx_s[...] = lTx_ref[...]
        Vxx_s[...] = lTxx_ref[...]
        dL_ref[0, :] = jnp.zeros((dL_ref.shape[1],), dL_ref.dtype)
        flags_ref[...] = jnp.zeros(flags_ref.shape, flags_ref.dtype)

    mu = scal_ref[0, :]                  # [B]
    reg = scal_ref[1, :]
    dc = scal_ref[2, :]

    Vx = Vx_s[...]                       # [nx, B]
    Vxx = Vxx_s[...]                     # [nx, nx, B]

    fx = fx_ref[0]                       # [nx, nx, B]
    fu = fu_ref[0]                       # [nx, nu, B]
    lx = lx_ref[0]                       # [nx, B]
    lu = lu_ref[0]                       # [nu, B]
    lxx = lxx_ref[0]
    lux = lux_ref[0]                     # [nu, nx, B]
    luu = luu_ref[0]
    sec = sec_ref[0]                     # [nz, nz, B]
    il_t = il_ref[0]                     # [nu, B]
    iu_t = iu_ref[0]
    zl_t = zl_ref[0]
    zu_t = zu_ref[0]

    sl = 1.0 / il_t                      # 0 where il = +inf
    su = 1.0 / iu_t
    sig_l = zl_t * sl
    sig_u = zu_t * su

    # Qu = lu + cu' phi + fu' Vx - mu/il + mu/iu   [nu, B]
    Qu = lu - mu[None, :] * sl + mu[None, :] * su
    for k in range(nx):
        Qu = Qu + fu[k] * Vx[k][None, :]
    if nc > 0:
        cx = cx_ref[0]                   # [nc, nx, B]
        cu = cu_ref[0]                   # [nc, nu, B]
        c_t = c_ref[0]                   # [nc, B]
        phi_t = phi_ref[0]               # [nc, B]
        for cc in range(nc):
            Qu = Qu + cu[cc] * phi_t[cc][None, :]

    # fuV = fu' Vxx [nu, nx, B]; fxV = fx' Vxx [nx, nx, B]
    fuV = jnp.zeros((nu, nx) + Qu.shape[-1:], dtype)
    fxV = jnp.zeros((nx, nx) + Qu.shape[-1:], dtype)
    for k in range(nx):
        fuV = fuV + fu[k][:, None, :] * Vxx[k][None, :, :]
        fxV = fxV + fx[k][:, None, :] * Vxx[k][None, :, :]

    C = lxx + sec[:nx, :nx]
    H = luu + sec[nx:, nx:]
    Bm = lux + sec[nx:, :nx]
    for k in range(nx):
        # (no inline-None indexing — it lowers to >2D gather; see matvec)
        fxVk = fxV[:, k, :][:, None, :]
        fuVk = fuV[:, k, :][:, None, :]
        C = C + fxVk * fx[k][None, :, :]
        H = H + fuVk * fu[k][None, :, :]
        Bm = Bm + fuVk * fx[k][None, :, :]
    eye_nu = _eye(nu, dtype)
    H = H + eye_nu[:, :, None] * (sig_l + sig_u + reg[None, :])[:, None, :]

    # KKT assembly: K = [H cu'; cu -dc I]   [m, m, B]
    if nc > 0:
        cuT = jnp.transpose(cu, (1, 0, 2))               # [nu, nc, B]
        eye_nc = _eye(nc, dtype)
        dcI = eye_nc[:, :, None] * dc[None, None, :]
        top = jnp.concatenate([H, cuT], axis=1)          # [nu, m, B]
        bot = jnp.concatenate([cu, -dcI], axis=1)        # [nc, m, B]
        K = jnp.concatenate([top, bot], axis=0)
        rhs = jnp.concatenate([
            jnp.concatenate([-Qu[:, None, :], -Bm], axis=1),
            jnp.concatenate([-c_t[:, None, :], -cx], axis=1),
        ], axis=0)                                       # [m, nx+1, B]
    else:
        K = H
        rhs = jnp.concatenate([-Qu[:, None, :], -Bm], axis=1)

    m = nu + nc
    X, n_pos, n_zero, finite, solve_ok = _ldlt_solve_lanes(
        K, rhs, m=m, refine=refine, rtol=rtol)

    alpha = X[:nu, 0, :]                 # [nu, B]
    beta = X[:nu, 1:, :]                 # [nu, nx, B]

    chi_l = mu[None, :] * sl - zl_t - sig_l * alpha
    zeta_l = -sig_l[:, None, :] * beta
    chi_u = mu[None, :] * su - zu_t + sig_u * alpha
    zeta_u = sig_u[:, None, :] * beta

    # Value recursion + expected decrease
    Vxx_n = C
    for k in range(nu):
        Vxx_n = Vxx_n + beta[k][:, None, :] * Bm[k][None, :, :]
    Vx_n = lx + jnp.sum(beta * Qu[:, None, :], axis=0)
    for k in range(nx):                  # fx' Vx
        Vx_n = Vx_n + fx[k] * Vx[k][None, :]
    dL_new = jnp.sum(Qu * alpha, axis=0)
    if nc > 0:
        psi = X[nu:, 0, :]               # [nc, B]
        omega = X[nu:, 1:, :]            # [nc, nx, B]
        for cc in range(nc):
            Vxx_n = Vxx_n + omega[cc][:, None, :] * cx[cc][None, :, :]
            Vx_n = Vx_n + cx[cc] * phi_t[cc][None, :] \
                + omega[cc] * c_t[cc][None, :]
        dL_new = dL_new + jnp.sum(c_t * psi, axis=0)
        psi_ref[0] = psi
        omega_ref[0] = omega
    # Symmetrize: roundoff asymmetry amplifies ~1.5x/stage otherwise.
    Vxx_n = 0.5 * (Vxx_n + jnp.transpose(Vxx_n, (1, 0, 2)))

    alpha_ref[0] = alpha
    beta_ref[0] = beta
    chi_l_ref[0] = chi_l
    zeta_l_ref[0] = zeta_l
    chi_u_ref[0] = chi_u
    zeta_u_ref[0] = zeta_u

    Vx_s[...] = Vx_n
    Vxx_s[...] = Vxx_n
    dL_ref[0, :] = dL_ref[0, :] + dL_new

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
def backward_sweep_pallas(
        fx, fu, lx, lu, lxx, lux, luu, cx, cu, sec,
        c_rel, il, iu, phi, zl, zu, lTx, lTxx, mu, reg, delta_c,
        *, nx, nu, nc, refine, rtol, tile_b=128, interpret=None):
    """Full-batch backward sweep. All per-stage args are batch-leading
    [B, T, ...]; per-instance scalars mu/reg/delta_c are [B]. Returns the
    gains as [B, T, ...] arrays plus (dL [B], fail [B] bool, singular [B]
    bool) — the exact signature of one `backward._run_pass` attempt, batched.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, T = fx.shape[0], fx.shape[1]
    dtype = fx.dtype
    nz = nx + nu
    nk = nx + 1

    tile_b = min(tile_b, B)
    pad = (-B) % tile_b
    if pad:
        padded = lambda a: jnp.pad(a, [(0, pad)] + [(0, 0)] * (a.ndim - 1),
                                   mode="edge")
    else:
        padded = lambda a: a
    Bp = B + pad

    # [B, T, ...] -> [T, ..., B] (batch on lanes)
    tl = lambda a: jnp.moveaxis(padded(a), 0, -1)

    scal = jnp.stack([mu, reg, delta_c], axis=0)         # [3, B]
    scal = padded(scal.T).T if pad else scal

    nb = Bp // tile_b
    grid = (nb, T)

    # NB: the reversed-time index is computed as i32 (`T - 1` as a weak
    # Python int promotes the subtraction to i64 under x64, and Mosaic
    # rejects an index-map function returning i64). np.int32 is strongly
    # typed and not a tracer (index maps may not capture tracers).
    import numpy as np
    Tm1 = np.int32(T - 1)

    zero32 = np.int32(0)

    def t_spec(*dims):
        block = (1,) + dims + (tile_b,)
        zeros = (zero32,) * len(dims)
        return pl.BlockSpec(block, lambda b, i: (Tm1 - i, *zeros, b),
                            memory_space=pltpu.VMEM)

    def const_spec(*dims):
        block = dims + (tile_b,)
        zeros = (zero32,) * len(dims)
        return pl.BlockSpec(block, lambda b, i: (*zeros, b),
                            memory_space=pltpu.VMEM)

    in_specs = [
        const_spec(3),                   # scal
        const_spec(nx),                  # lTx
        const_spec(nx, nx),              # lTxx
        t_spec(nx, nx),                  # fx
        t_spec(nx, nu),                  # fu
        t_spec(nx),                      # lx
        t_spec(nu),                      # lu
        t_spec(nx, nx),                  # lxx
        t_spec(nu, nx),                  # lux
        t_spec(nu, nu),                  # luu
        t_spec(max(nc, 1), nx),          # cx
        t_spec(max(nc, 1), nu),          # cu
        t_spec(nz, nz),                  # sec
        t_spec(max(nc, 1)),              # c
        t_spec(nu),                      # il
        t_spec(nu),                      # iu
        t_spec(max(nc, 1)),              # phi
        t_spec(nu),                      # zl
        t_spec(nu),                      # zu
    ]
    out_specs = (
        t_spec(nu),                      # alpha
        t_spec(nu, nx),                  # beta
        t_spec(max(nc, 1)),              # psi
        t_spec(max(nc, 1), nx),          # omega
        t_spec(nu),                      # chi_l
        t_spec(nu, nx),                  # zeta_l
        t_spec(nu),                      # chi_u
        t_spec(nu, nx),                  # zeta_u
        const_spec(1),                   # dL (accumulated in-place)
        const_spec(2),                   # flags (fail, singular)
    )
    # outputs vary over whatever mesh axes the inputs do (under shard_map
    # the whole sweep is per-shard, so vma propagates unchanged); without
    # this, shard_map's check_vma rejects the pallas_call out_shape
    vma = getattr(jax.typeof(fx), "vma", frozenset())
    out_shape = (
        jax.ShapeDtypeStruct((T, nu, Bp), dtype, vma=vma),
        jax.ShapeDtypeStruct((T, nu, nx, Bp), dtype, vma=vma),
        jax.ShapeDtypeStruct((T, max(nc, 1), Bp), dtype, vma=vma),
        jax.ShapeDtypeStruct((T, max(nc, 1), nx, Bp), dtype, vma=vma),
        jax.ShapeDtypeStruct((T, nu, Bp), dtype, vma=vma),
        jax.ShapeDtypeStruct((T, nu, nx, Bp), dtype, vma=vma),
        jax.ShapeDtypeStruct((T, nu, Bp), dtype, vma=vma),
        jax.ShapeDtypeStruct((T, nu, nx, Bp), dtype, vma=vma),
        jax.ShapeDtypeStruct((1, Bp), dtype, vma=vma),
        jax.ShapeDtypeStruct((2, Bp), jnp.int32, vma=vma),
    )

    nc1 = max(nc, 1)
    zt = lambda *dims: jnp.zeros((B, T) + dims, dtype)
    args = (
        scal,
        jnp.moveaxis(padded(lTx), 0, -1),
        jnp.moveaxis(padded(lTxx), 0, -1),
        tl(fx), tl(fu), tl(lx), tl(lu), tl(lxx), tl(lux), tl(luu),
        tl(cx) if nc > 0 else tl(zt(nc1, nx)),
        tl(cu) if nc > 0 else tl(zt(nc1, nu)),
        tl(sec),
        tl(c_rel) if nc > 0 else tl(zt(nc1)),
        tl(il), tl(iu),
        tl(phi) if nc > 0 else tl(zt(nc1)),
        tl(zl), tl(zu),
    )

    outs = pl.pallas_call(
        partial(_kernel, nx=nx, nu=nu, nc=nc, refine=refine, rtol=rtol),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((nx, tile_b), dtype),          # Vx carry
            pltpu.VMEM((nx, nx, tile_b), dtype),      # Vxx carry
        ],
        interpret=bool(interpret),
        debug=bool(int(__import__("os").environ.get("PALLAS_DEBUG", "0"))),
    )(*args)

    (alpha, beta, psi, omega, chi_l, zeta_l, chi_u, zeta_u,
     dL, flags) = outs

    fb = lambda a: jnp.moveaxis(a, -1, 0)[:B]        # [T,...,Bp] -> [B,T,...]
    gains = (fb(alpha), fb(beta),
             fb(psi)[:, :, :nc], fb(omega)[:, :, :nc],
             fb(chi_l), fb(zeta_l), fb(chi_u), fb(zeta_u))
    return gains, dL[0, :B], flags[0, :B] > 0, flags[1, :B] > 0
