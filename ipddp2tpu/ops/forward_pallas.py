"""Pallas TPU megakernel for the forward pass: rollout + line-search metrics.

After round 2's backward megakernel, the measured per-iteration wall is
dominated by the FORWARD side (docs/PERF.md: full line search 48.9 ms vs the
backward kernel's 12 ms per f64-endgame iteration at b64) — a sequential
`lax.scan` of ~100 tiny stages re-dispatched per backtracking trial, exactly
the latency-bound chain the backward kernel eliminated. This module fuses it
the same way (reference semantics: src/forward_pass.jl:98-153):

  * `forward_metrics_pallas` — ONE kernel evaluates ALL K speculative step
    sizes: grid = (batch_tiles, K, T), time innermost, the rolled-out state
    carried in VMEM scratch; per stage it applies the affine update rule,
    steps the dynamics, and ACCUMULATES the acceptance metrics (constraint
    violation theta, barrier Lagrangian L, objective J, finiteness,
    fraction-to-boundary) — no trajectory ever touches HBM. Output is
    [K, B] scalars; the filter/Armijo/switching acceptance then runs in XLA
    with the exact `forward.forward_pass_speculative` semantics.
  * `forward_trial_pallas` — re-rolls ONLY the selected per-instance gamma
    (grid = (batch_tiles, T)) and emits the accepted Trial arrays.

Model functions (dynamics / constraints / costs) execute INSIDE the kernel:
in f32 mode they are traced directly (vmapped with batch on the trailing
lane axis); in df64 mode they are interpreted in double-single arithmetic by
`ops/ddeval.py`, with the barrier logs through `df64.log` — the f64-endgame
equivalent, since Mosaic has no f64. Layout conventions (batch-on-lanes
[T, ..., B]; df64 pairs as a size-2 axis after time, [T, 2, ..., B]) follow
`backward_pallas.py` / `backward_pallas_df64.py`.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import df64 as dd
from .ddeval import eval_dd_jaxpr, eval_jaxpr_mosaic, make_dd_jaxpr
from .df64 import DF

F32 = jnp.float32


# ---------------------------------------------------------------------------
# Arithmetic shims: the kernel body is written once against this interface.
# ---------------------------------------------------------------------------

class _OpsF32:
    pair = False

    @staticmethod
    def ld(block):                   # drop the leading time axis of a block
        return block[0]

    add = staticmethod(jnp.add)
    sub = staticmethod(jnp.subtract)
    mul = staticmethod(jnp.multiply)
    neg = staticmethod(jnp.negative)
    abs = staticmethod(jnp.abs)
    where = staticmethod(jnp.where)

    @staticmethod
    def log(a):
        return jnp.log(a)

    @staticmethod
    def lt(a, b):
        return a < b

    @staticmethod
    def hi(a):
        return a

    @staticmethod
    def wrap(x):                     # plain f32 array -> value
        return x

    @staticmethod
    def scalar(c, like):
        return jnp.zeros_like(like) + jnp.asarray(c, like.dtype)

    @staticmethod
    def zeros(shape):
        return jnp.zeros(shape, F32)


class _OpsDD:
    pair = True
    ld = staticmethod(lambda block: DF(block[0, 0], block[0, 1]))
    add = staticmethod(dd.add)
    sub = staticmethod(dd.sub)
    mul = staticmethod(dd.mul)
    neg = staticmethod(dd.neg)
    abs = staticmethod(dd.abs_)
    where = staticmethod(dd.where)
    log = staticmethod(dd.log)
    lt = staticmethod(dd.lt)

    @staticmethod
    def hi(a):
        return a.hi

    @staticmethod
    def wrap(x):
        return DF(x, jnp.zeros_like(x))

    @staticmethod
    def scalar(c, like):
        z = jnp.zeros_like(like.hi)
        chi = np.float32(c)
        return DF(z + jnp.asarray(chi, F32),
                  z + jnp.asarray(np.float32(float(c) - float(chi)), F32))

    @staticmethod
    def zeros(shape):
        return DF(jnp.zeros(shape, F32), jnp.zeros(shape, F32))


def _row(O, mat, i):
    """Row i of a [m, n, B] value."""
    if O.pair:
        return DF(mat.hi[i], mat.lo[i])
    return mat[i]


def _entry(O, vec, i):
    if O.pair:
        return DF(vec.hi[i], vec.lo[i])
    return vec[i]


def _stack(O, parts):
    if O.pair:
        return DF(jnp.stack([p.hi for p in parts]),
                  jnp.stack([p.lo for p in parts]))
    return jnp.stack(parts)


def _affine(O, base, gamma, ff, fb, dx, n):
    """base + gamma*ff + fb @ dx, batched on lanes ([n, B] result)."""
    rows = []
    for i in range(n):
        acc = O.add(_entry(O, base, i), O.mul(gamma, _entry(O, ff, i)))
        row = _row(O, fb, i)
        for k in range(dx.hi.shape[0] if O.pair else dx.shape[0]):
            acc = O.add(acc, O.mul(_entry(O, row, k), _entry(O, dx, k)))
        rows.append(acc)
    return _stack(O, rows)


def _theta_struct(theta):
    """Hashable (treedef, per-instance leaf shapes) key for model tracing."""
    if theta is None:
        return None
    leaves, treedef = jax.tree.flatten(theta)
    return (treedef, tuple(l.shape[1:] for l in leaves))


from functools import lru_cache


@lru_cache(maxsize=32)
def _traced_model_cached(problem, theta_struct, tile_b, dd_mode):
    return _TracedModel(problem, theta_struct, tile_b, dd_mode)


class _TracedModel:
    """The model functions pre-traced to jaxprs with hoisted constants.

    Pallas kernels may not capture array constants, and model functions
    routinely close over arrays (goal states, block parameters). So the
    vmapped stage/terminal functions are traced OUTSIDE the kernel, their
    constants are shipped in as extra kernel inputs, and the kernel
    re-executes the jaxpr: via `ops/ddeval` in df64 mode, via
    `jax.core.eval_jaxpr` (exact f32 primitive semantics) otherwise.
    """

    def __init__(self, problem, theta_struct, tile_b, dd_mode):
        self.dd_mode = dd_mode
        nx, nu = problem.nx, problem.nu

        if theta_struct is None:
            theta_axes = None
        else:
            treedef, shapes = theta_struct
            theta_axes = jax.tree.unflatten(treedef, [-1] * len(shapes))

        def stage(x_, u_, t_, th_):
            xn = problem.dynamics(x_, u_, t_, th_)
            c = problem.eval_constraints(x_, u_, t_, th_)
            if problem.nc == 0:
                c = jnp.zeros((1,), x_.dtype)
            cost = problem.stage_cost(x_, u_, t_, th_)
            return xn, c, cost

        vf_stage = jax.vmap(stage, in_axes=(-1, -1, None, theta_axes),
                            out_axes=-1)
        vf_term = jax.vmap(lambda x_, th_: problem.terminal_cost(x_, th_),
                           in_axes=(-1, theta_axes), out_axes=-1)

        dt = jnp.float64 if dd_mode else F32
        mk = lambda *shape: jnp.zeros(shape + (tile_b,), dt)
        x_t, u_t = mk(nx), mk(nu)
        t_t = jnp.int32(0)
        theta_t = None
        if theta_struct is not None:
            tl = [mk(*s) for s in shapes]
            theta_t = jax.tree.unflatten(treedef, tl)

        if dd_mode:
            w = lambda a: (DF(a.astype(F32), jnp.zeros(a.shape, F32))
                           if jnp.issubdtype(a.dtype, jnp.floating) else a)
            wt = jax.tree.map(w, (x_t, u_t, t_t, theta_t))
            self.stage_closed, self.stage_tree = make_dd_jaxpr(
                vf_stage, *wt)
            self.term_closed, self.term_tree = make_dd_jaxpr(
                vf_term, wt[0], wt[3])
        else:
            self.stage_closed = jax.make_jaxpr(vf_stage)(
                x_t, u_t, t_t, theta_t)
            self.term_closed = jax.make_jaxpr(vf_term)(x_t, theta_t)
            self.stage_tree = jax.tree.structure(
                jax.eval_shape(vf_stage, x_t, u_t, t_t, theta_t))
            self.term_tree = jax.tree.structure(
                jax.eval_shape(vf_term, x_t, theta_t))

        # hoist constants -> kernel input arrays (+ reconstruction meta)
        self.const_args = []
        self.const_meta = []         # (kind, orig_shape, store_shape)
        for c in (list(self.stage_closed.consts)
                  + list(self.term_closed.consts)):
            arr = np.asarray(c)
            shape = arr.shape
            lift = (1,) * max(0, 2 - len(shape)) + shape
            if np.issubdtype(arr.dtype, np.floating):
                if dd_mode:
                    hi = arr.astype(np.float32)
                    lo = (arr.astype(np.float64)
                          - hi.astype(np.float64)).astype(np.float32)
                    lo = np.where(np.isfinite(hi), lo, 0.0)
                    store = np.stack([hi.reshape(lift), lo.reshape(lift)])
                    self.const_meta.append(("dd", shape, store.shape))
                else:
                    store = arr.astype(np.float32).reshape(lift)
                    self.const_meta.append(("f32", shape, store.shape))
            elif arr.dtype == np.bool_:
                store = arr.astype(np.int32).reshape(lift)
                self.const_meta.append(("bool", shape, store.shape))
            else:
                store = arr.astype(np.int32).reshape(lift)
                self.const_meta.append(("int", shape, store.shape))
            # KEEP as numpy: this object is lru_cached and may be built
            # while an outer jit trace is active — jnp.asarray would then
            # produce a DynamicJaxprTracer that leaks into later traces
            # ("No constant handler" errors). np arrays are trace-agnostic;
            # call sites convert per-call.
            self.const_args.append(store)
        self.n_stage_consts = len(self.stage_closed.consts)

    def read_consts(self, const_refs):
        vals = []
        for ref, (kind, shape, _) in zip(const_refs, self.const_meta):
            v = ref[...]
            if kind == "dd":
                vals.append(DF(v[0].reshape(shape), v[1].reshape(shape)))
            elif kind == "bool":
                vals.append(v.reshape(shape) != 0)
            else:
                vals.append(v.reshape(shape))
        return (vals[:self.n_stage_consts], vals[self.n_stage_consts:])

    def stage_eval(self, consts, x, u, t, theta):
        if self.dd_mode:
            return eval_dd_jaxpr(self.stage_closed, self.stage_tree,
                                 consts, x, u, t, theta)
        return eval_jaxpr_mosaic(self.stage_closed, self.stage_tree,
                                 consts, x, u, t, theta)

    def term_eval(self, consts, xT, theta):
        if self.dd_mode:
            return eval_dd_jaxpr(self.term_closed, self.term_tree,
                                 consts, xT, theta)
        return eval_jaxpr_mosaic(self.term_closed, self.term_tree,
                                 consts, xT, theta)


def _sum_axis0(O, v, n):
    acc = _entry(O, v, 0)
    for i in range(1, n):
        acc = O.add(acc, _entry(O, v, i))
    return acc


def _kernel_body(O, problem, model: "_TracedModel", theta_treedef,
                 n_theta, theta_lifted, refs, *, emit_trial, T):
    """Shared per-grid-step body. `refs` is the flat ref list in order."""
    nx, nu, nc = problem.nx, problem.nu, problem.nc
    nc1 = max(nc, 1)
    i = pl.program_id(2) if not emit_trial else pl.program_id(1)

    (gamma_ref, scal_ref, lo_ref, hi_ref,
     xbar_ref, ubar_ref, phibar_ref, zlbar_ref, zubar_ref,
     ilbar_ref, iubar_ref,
     alpha_ref, beta_ref, psi_ref, omega_ref,
     chi_l_ref, zeta_l_ref, chi_u_ref, zeta_u_ref,
     *rest) = refs
    theta_refs = rest[:n_theta]
    n_const = len(model.const_meta)
    const_refs = rest[n_theta:n_theta + n_const]
    outs = rest[n_theta + n_const:-1]
    x_s = rest[-1]
    stage_consts, term_consts = model.read_consts(const_refs)

    # scalars: (mu, tau) as [pair?, 2, B]; gamma as [.., B] lane vectors
    if O.pair:
        mu = DF(scal_ref[0, 0], scal_ref[1, 0])
        tau = DF(scal_ref[0, 1], scal_ref[1, 1])
        gamma = (DF(gamma_ref[0, 0], gamma_ref[0, 1]) if not emit_trial
                 else DF(gamma_ref[0], gamma_ref[1]))
    else:
        mu = scal_ref[0]
        tau = scal_ref[1]
        gamma = gamma_ref[0, 0] if not emit_trial else gamma_ref[0]
    one = O.scalar(1.0, mu)
    s_ftb = O.sub(one, tau)                       # [B]

    theta = None
    if n_theta:
        leaves = []
        for r, lifted in zip(theta_refs, theta_lifted):
            v = DF(r[0], r[1]) if O.pair else r[...]
            if lifted:                 # restore per-instance scalars -> [B]
                v = DF(v.hi[0], v.lo[0]) if O.pair else v[0]
            leaves.append(v)
        theta = jax.tree.unflatten(theta_treedef, leaves)

    xbar = O.ld(xbar_ref)
    ubar = O.ld(ubar_ref)
    phibar = O.ld(phibar_ref)
    zlbar = O.ld(zlbar_ref)
    zubar = O.ld(zubar_ref)
    ilbar = O.ld(ilbar_ref)
    iubar = O.ld(iubar_ref)
    lo = O.ld(lo_ref)
    hi = O.ld(hi_ref)
    alpha = O.ld(alpha_ref)
    beta = O.ld(beta_ref)
    psi = O.ld(psi_ref)
    omega = O.ld(omega_ref)
    chi_l = O.ld(chi_l_ref)
    zeta_l = O.ld(zeta_l_ref)
    chi_u = O.ld(chi_u_ref)
    zeta_u = O.ld(zeta_u_ref)

    @pl.when(i == 0)
    def _init():
        if O.pair:
            x_s[0], x_s[1] = xbar.hi, xbar.lo
        else:
            x_s[...] = xbar
        if not emit_trial:
            for o in outs[:3]:                     # th, L, J accumulators
                o[...] = jnp.zeros(o.shape, o.dtype)
            outs[3][...] = jnp.ones(outs[3].shape, outs[3].dtype)  # flags

    x = DF(x_s[0], x_s[1]) if O.pair else x_s[...]

    dx = O.sub(x, xbar)
    u = _affine(O, ubar, gamma, alpha, beta, dx, nu)
    phi = _affine(O, phibar, gamma, psi, omega, dx, nc1)
    zl = _affine(O, zlbar, gamma, chi_l, zeta_l, dx, nu)
    zu = _affine(O, zubar, gamma, chi_u, zeta_u, dx, nu)
    # slacks: +inf at absent bounds, like plain arithmetic u - (-inf).
    # dd TwoSum on an infinite operand yields NaN (inf - inf), which would
    # poison the NEXT backward pass's Sigma terms through the trial output,
    # so the unbounded entries are pinned explicitly.
    ml_b = jnp.isfinite(O.hi(lo))
    mu_b = jnp.isfinite(O.hi(hi))
    pos_inf = O.wrap(jnp.full_like(O.hi(ubar), float("inf")))
    il = O.where(ml_b, O.sub(u, lo), pos_inf)
    iu = O.where(mu_b, O.sub(hi, u), pos_inf)

    t_idx = i
    x_next, c_raw, cost = model.stage_eval(stage_consts, x, u, t_idx, theta)
    # mu-relaxation of complementarity rows: mask built from iota compares
    # (an array constant would be a forbidden kernel capture)
    if nc > 0 and problem.compl_indices and not emit_trial:
        row = jax.lax.broadcasted_iota(jnp.int32, (nc1, 1), 0)
        mf = jnp.zeros((nc1, 1), F32)
        for idx in problem.compl_indices:
            mf = mf + jnp.where(row == idx, jnp.ones((), F32),
                                jnp.zeros((), F32))
        mask = O.wrap(mf + jnp.zeros_like(O.hi(c_raw)))
        c_rel = O.sub(c_raw, O.mul(mu, mask))
    else:
        c_rel = c_raw

    if O.pair:
        x_s[0], x_s[1] = x_next.hi, x_next.lo
    else:
        x_s[...] = x_next

    if emit_trial:
        (u_o, phi_o, zl_o, zu_o, il_o, iu_o, c_o, x_o, xT_o) = outs
        pairs = ((u_o, u), (phi_o, phi), (zl_o, zl), (zu_o, zu),
                 (il_o, il), (iu_o, iu), (c_o, c_rel), (x_o, x))
        for ref, val in pairs:
            if O.pair:
                ref[0, 0], ref[0, 1] = val.hi, val.lo
            else:
                ref[0] = val

        @pl.when(i == np.int32(T - 1))
        def _last():
            if O.pair:
                xT_o[0], xT_o[1] = x_next.hi, x_next.lo
            else:
                xT_o[...] = x_next
        return

    (th_o, L_o, J_o, flags_o) = outs

    # ---- metric accumulation ----
    th_stage = _sum_axis0(O, O.abs(c_rel), nc1)
    cphi = _sum_axis0(O, O.mul(c_rel, phi), nc1)

    ml = jnp.isfinite(O.hi(lo))                   # static-in-practice masks
    mu_m = jnp.isfinite(O.hi(hi))
    il_safe = O.where(ml, il, O.wrap(jnp.ones_like(O.hi(il))))
    iu_safe = O.where(mu_m, iu, O.wrap(jnp.ones_like(O.hi(iu))))
    zero_nu = O.wrap(jnp.zeros_like(O.hi(il)))
    log_l = O.where(ml, O.log(il_safe), zero_nu)
    log_u = O.where(mu_m, O.log(iu_safe), zero_nu)
    logsum = O.add(_sum_axis0(O, log_l, problem.nu),
                   _sum_axis0(O, log_u, problem.nu))

    # bool any/all reductions lower through f64 min/max under Mosaic+x64;
    # rewrite them as explicit f32 reductions (same pattern as
    # backward_pallas._ldlt_solve_lanes)
    one_f = jnp.ones((), F32)
    zero_f = jnp.zeros((), F32)
    b2f = lambda p: jnp.where(p, one_f, zero_f)

    def all_lanes(pred):                  # [dims.., B] bool -> [B] bool
        return jnp.min(b2f(pred).reshape((-1,) + pred.shape[-1:]),
                       axis=0) > 0.0

    fin = all_lanes(jnp.isfinite(O.hi(u)))
    for v in (phi, zl, zu, x_next, c_raw):
        fin = fin & all_lanes(jnp.isfinite(O.hi(v)))

    # fraction-to-boundary: fail where (1-tau)*nominal > current
    def ftb_ok(nom, cur):
        viol = O.hi(O.sub(O.mul(s_ftb, nom), cur)) > 0.0
        return all_lanes(~viol)

    ftb = (ftb_ok(ilbar, il) & ftb_ok(iubar, iu)
           & ftb_ok(zlbar, zl) & ftb_ok(zubar, zu))

    def acc_out(ref, val):
        if O.pair:
            prev = DF(ref[0, 0], ref[0, 1])
            new = dd.add(prev, val)
            ref[0, 0], ref[0, 1] = new.hi, new.lo
        else:
            ref[0, 0] = ref[0, 0] + val

    acc_out(th_o, th_stage)
    acc_out(J_o, cost)
    # L accumulates cost + c.phi - mu*logs; terminal added at the last stage
    L_stage = O.add(cost, O.sub(cphi, O.mul(mu, logsum)))
    acc_out(L_o, L_stage)

    i32_one = jnp.ones((), jnp.int32)
    i32_zero = jnp.zeros((), jnp.int32)
    flags_o[0, 0] = flags_o[0, 0] * jnp.where(fin, i32_one, i32_zero)
    flags_o[0, 1] = flags_o[0, 1] * jnp.where(ftb, i32_one, i32_zero)

    @pl.when(i == np.int32(T - 1))
    def _last():
        term = model.term_eval(term_consts,
                               DF(x_s[0], x_s[1]) if O.pair else x_s[...],
                               theta)
        fin_T = all_lanes(jnp.isfinite(O.hi(x_next)))
        flags_o[0, 0] = flags_o[0, 0] * jnp.where(fin_T, i32_one, i32_zero)
        acc_out(J_o, term)
        acc_out(L_o, term)


def _layout(dd_mode, tile_b, pad):
    """Array-to-lane-layout converters for this mode."""
    if pad:
        padf = lambda a: jnp.pad(a, [(0, pad)] + [(0, 0)] * (a.ndim - 1),
                                 mode="edge")
    else:
        padf = lambda a: a

    def tl_t(a):                      # [B, T, ...] -> time-indexed blocks
        m = jnp.moveaxis(padf(a), 0, -1)                     # [T, ..., B]
        if dd_mode:
            d = dd.from_f64(m)
            return jnp.stack([d.hi, d.lo], axis=1)           # [T, 2, ..., B]
        return m.astype(F32)

    def tl_c(a):                      # [B, ...] -> constant blocks
        m = jnp.moveaxis(padf(a), 0, -1)                     # [..., B]
        if dd_mode:
            d = dd.from_f64(m)
            return jnp.stack([d.hi, d.lo], axis=0)           # [2, ..., B]
        return m.astype(F32)

    return padf, tl_t, tl_c


def _theta_leaves(theta):
    if theta is None:
        return [], None, None, []
    leaves, treedef = jax.tree.flatten(theta)
    lifted = [l.ndim == 1 for l in leaves]
    # lift per-instance scalars to [B, 1] so every block is >= 2-D (the
    # kernel squeezes them back to per-lane scalars)
    leaves = [l[:, None] if l.ndim == 1 else l for l in leaves]
    axes_tree = jax.tree.unflatten(treedef, [-1] * len(leaves))
    return leaves, treedef, axes_tree, lifted


def _common_specs(problem, dd_mode, tile_b, grid_idx, T):
    """(t_spec, const_spec) builders for this grid arity."""
    nz = np.int32(0)

    if grid_idx == 3:                 # metrics: (b, k, i)
        def t_spec(*dims):
            if dd_mode:
                block = (1, 2) + dims + (tile_b,)
                return pl.BlockSpec(block,
                                    lambda b, k, i: (i, nz) + (nz,) * len(dims)
                                    + (b,), memory_space=pltpu.VMEM)
            block = (1,) + dims + (tile_b,)
            return pl.BlockSpec(block,
                                lambda b, k, i: (i,) + (nz,) * len(dims)
                                + (b,), memory_space=pltpu.VMEM)

        def const_spec(*dims):
            if dd_mode:
                block = (2,) + dims + (tile_b,)
                return pl.BlockSpec(block,
                                    lambda b, k, i: (nz,) + (nz,) * len(dims)
                                    + (b,), memory_space=pltpu.VMEM)
            block = dims + (tile_b,)
            return pl.BlockSpec(block,
                                lambda b, k, i: (nz,) * len(dims) + (b,),
                                memory_space=pltpu.VMEM)
        return t_spec, const_spec

    def t_spec(*dims):                # trial: (b, i)
        if dd_mode:
            block = (1, 2) + dims + (tile_b,)
            return pl.BlockSpec(block,
                                lambda b, i: (i, nz) + (nz,) * len(dims)
                                + (b,), memory_space=pltpu.VMEM)
        block = (1,) + dims + (tile_b,)
        return pl.BlockSpec(block,
                            lambda b, i: (i,) + (nz,) * len(dims) + (b,),
                            memory_space=pltpu.VMEM)

    def const_spec(*dims):
        if dd_mode:
            block = (2,) + dims + (tile_b,)
            return pl.BlockSpec(block,
                                lambda b, i: (nz,) + (nz,) * len(dims) + (b,),
                                memory_space=pltpu.VMEM)
        block = dims + (tile_b,)
        return pl.BlockSpec(block,
                            lambda b, i: (nz,) * len(dims) + (b,),
                            memory_space=pltpu.VMEM)
    return t_spec, const_spec


def _common_args(problem, theta, lo, hi, gains, xbar, ubar, phibar,
                 zlbar, zubar, ilbar, iubar, mu, tau, dd_mode, tile_b):
    """Everything both kernels share: padded/lane-layout inputs + specs."""
    B = xbar.shape[0]
    T, nx, nu, nc = problem.T, problem.nx, problem.nu, problem.nc
    nc1 = max(nc, 1)
    tile_b = min(tile_b, B)
    pad = (-B) % tile_b
    Bp = B + pad
    padf, tl_t, tl_c = _layout(dd_mode, tile_b, pad)

    (alpha, beta, psi, omega, chi_l, zeta_l, chi_u, zeta_u) = gains
    if nc == 0:
        zc = jnp.zeros((B, T, nc1), xbar.dtype)
        zcx = jnp.zeros((B, T, nc1, nx), xbar.dtype)
        phibar, psi, omega = zc, zc, zcx

    # (mu, tau) -> [B, 2] -> tl_c -> [pair?, 2, B]
    scal = tl_c(jnp.stack([mu, tau], axis=-1))

    leaves, treedef, theta_axes, lifted = _theta_leaves(theta)
    theta_args = [tl_c(l) for l in leaves]

    args = [scal, tl_t(lo), tl_t(hi),
            tl_t(xbar[:, :T]), tl_t(ubar), tl_t(phibar), tl_t(zlbar),
            tl_t(zubar), tl_t(ilbar), tl_t(iubar),
            tl_t(alpha), tl_t(beta), tl_t(psi), tl_t(omega),
            tl_t(chi_l), tl_t(zeta_l), tl_t(chi_u), tl_t(zeta_u)]
    t_dims = [(nu,), (nu,),
              (nx,), (nu,), (nc1,), (nu,), (nu,), (nu,), (nu,),
              (nu,), (nu, nx), (nc1,), (nc1, nx),
              (nu,), (nu, nx), (nu,), (nu, nx)]
    theta_dims = [t.shape[(1 if dd_mode else 0):-1] for t in theta_args]

    model = _traced_model_cached(problem, _theta_struct(theta), tile_b,
                                 dd_mode)

    return dict(B=B, Bp=Bp, T=T, tile_b=tile_b, padf=padf, tl_t=tl_t,
                tl_c=tl_c, args=args, t_dims=t_dims, theta_args=theta_args,
                theta_dims=theta_dims, treedef=treedef,
                theta_axes=theta_axes, lifted=lifted, model=model, nc1=nc1)


def forward_metrics_pallas(problem, theta, lo, hi, gains,
                           xbar, ubar, phibar, zlbar, zubar, ilbar, iubar,
                           mu, tau, gammas, *, dd_mode, tile_b=128,
                           interpret=None):
    """Line-search candidate metrics for all K step sizes in one launch.

    Batch-leading inputs ([B, T, ...]); `gammas` is a length-K f32/f64 array
    of candidate step sizes. Returns (theta_sum, L, J, finite, ftb_ok), each
    [B, K] (f64 in dd mode, f32 otherwise).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    c = _common_args(problem, theta, lo, hi, gains, xbar, ubar, phibar,
                     zlbar, zubar, ilbar, iubar, mu, tau, dd_mode, tile_b)
    K = int(gammas.shape[0])
    T, Bp, tile_b = c["T"], c["Bp"], c["tile_b"]
    nb = Bp // tile_b
    grid = (nb, K, T)

    t_spec, const_spec = _common_specs(problem, dd_mode, tile_b, 3, T)
    nz = np.int32(0)

    # candidate step sizes broadcast to lane vectors [K, (pair,) Bp]
    gam = jnp.broadcast_to(jnp.asarray(gammas)[:, None], (K, Bp))
    if dd_mode:
        gd = dd.from_f64(gam.astype(jnp.float64))
        gam_arr = jnp.stack([gd.hi, gd.lo], axis=1)          # [K, 2, Bp]
        gam_spec = pl.BlockSpec((1, 2, tile_b),
                                lambda b, k, i: (k, nz, b),
                                memory_space=pltpu.VMEM)
    else:
        # [K, 1, Bp]: Mosaic requires the last-two block dims to divide
        # (8, 128) or equal the array dims — a (1, tile_b) block of a
        # [K, Bp] array violates the sublane rule
        gam_arr = gam.astype(F32)[:, None, :]
        gam_spec = pl.BlockSpec((1, 1, tile_b), lambda b, k, i: (k, nz, b),
                                memory_space=pltpu.VMEM)

    model = c["model"]
    in_specs = [gam_spec, const_spec(2)]
    in_specs += [t_spec(*d) for d in c["t_dims"]]
    in_specs += [const_spec(*d) for d in c["theta_dims"]]
    in_specs += [
        pl.BlockSpec(ss, (lambda n: lambda b, k, i: (nz,) * n)(len(ss)),
                     memory_space=pltpu.VMEM)
        for (_, _, ss) in model.const_meta]

    pairn = 2 if dd_mode else 1

    def out_spec(width):
        block = (1, width, tile_b)
        return pl.BlockSpec(block, lambda b, k, i: (k, nz, b),
                            memory_space=pltpu.VMEM)

    out_specs = (out_spec(pairn), out_spec(pairn), out_spec(pairn),
                 out_spec(2))
    vma = getattr(jax.typeof(xbar), "vma", frozenset())
    out_shape = (
        jax.ShapeDtypeStruct((K, pairn, Bp), F32, vma=vma),
        jax.ShapeDtypeStruct((K, pairn, Bp), F32, vma=vma),
        jax.ShapeDtypeStruct((K, pairn, Bp), F32, vma=vma),
        jax.ShapeDtypeStruct((K, 2, Bp), jnp.int32, vma=vma),
    )

    O = _OpsDD if dd_mode else _OpsF32

    def kernel(*refs):
        _kernel_body(O, problem, model, c["treedef"],
                     len(c["theta_args"]), c["lifted"],
                     list(refs), emit_trial=False, T=T)

    th, L, J, flags = pl.pallas_call(
        kernel, grid=grid, in_specs=in_specs, out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM(((2,) if dd_mode else ())
                                   + (problem.nx, tile_b), F32)],
        interpret=bool(interpret),
    )(gam_arr, *c["args"], *c["theta_args"], *model.const_args)

    B = c["B"]

    def unpair(a):                                            # [K, p, Bp]
        if dd_mode:
            return dd.to_f64(DF(a[:, 0, :B], a[:, 1, :B])).T  # [B, K] f64
        return a[:, 0, :B].T

    finite = flags[:, 0, :B].T > 0
    ftb = flags[:, 1, :B].T > 0
    return unpair(th), unpair(L), unpair(J), finite, ftb


def forward_trial_pallas(problem, theta, lo, hi, gains,
                         xbar, ubar, phibar, zlbar, zubar, ilbar, iubar,
                         mu, tau, gamma, *, dd_mode, tile_b=128,
                         interpret=None):
    """Roll out ONE per-instance step size `gamma` [B] and emit the Trial
    arrays: (x [B,T+1,nx], u, phi, zl, zu, il, iu, c_raw), with c_raw the
    UN-relaxed constraint values — the exact `forward.rollout` contract."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    c = _common_args(problem, theta, lo, hi, gains, xbar, ubar, phibar,
                     zlbar, zubar, ilbar, iubar, mu, tau, dd_mode, tile_b)
    T, Bp, tile_b = c["T"], c["Bp"], c["tile_b"]
    nb = Bp // tile_b
    grid = (nb, T)
    nx, nu = problem.nx, problem.nu
    nc1 = c["nc1"]

    t_spec, const_spec = _common_specs(problem, dd_mode, tile_b, 2, T)

    gam = c["padf"](jnp.asarray(gamma))
    nz = np.int32(0)
    if dd_mode:
        gd = dd.from_f64(gam.astype(jnp.float64))
        gam_arr = jnp.stack([gd.hi, gd.lo], axis=0)          # [2, Bp]
        gam_spec = pl.BlockSpec((2, tile_b), lambda b, i: (nz, b),
                                memory_space=pltpu.VMEM)
    else:
        gam_arr = gam.astype(F32)[None, :]                   # [1, Bp]
        gam_spec = pl.BlockSpec((1, tile_b), lambda b, i: (nz, b),
                                memory_space=pltpu.VMEM)

    model = c["model"]
    in_specs = [gam_spec, const_spec(2)]
    in_specs += [t_spec(*d) for d in c["t_dims"]]
    in_specs += [const_spec(*d) for d in c["theta_dims"]]
    in_specs += [
        pl.BlockSpec(ss, (lambda n: lambda b, i: (nz,) * n)(len(ss)),
                     memory_space=pltpu.VMEM)
        for (_, _, ss) in model.const_meta]

    out_specs = tuple(t_spec(*d) for d in
                      [(nu,), (nc1,), (nu,), (nu,), (nu,), (nu,), (nc1,),
                       (nx,)]) + (const_spec(nx),)
    pair_shape = (2,) if dd_mode else ()
    vma = getattr(jax.typeof(xbar), "vma", frozenset())
    ts = lambda *d: jax.ShapeDtypeStruct((T,) + pair_shape + d + (Bp,), F32,
                                         vma=vma)
    out_shape = (ts(nu), ts(nc1), ts(nu), ts(nu), ts(nu), ts(nu), ts(nc1),
                 ts(nx),
                 jax.ShapeDtypeStruct(pair_shape + (nx, Bp), F32, vma=vma))

    O = _OpsDD if dd_mode else _OpsF32

    def kernel(*refs):
        _kernel_body(O, problem, model, c["treedef"],
                     len(c["theta_args"]), c["lifted"],
                     list(refs), emit_trial=True, T=T)

    outs = pl.pallas_call(
        kernel, grid=grid, in_specs=in_specs, out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM(((2,) if dd_mode else ())
                                   + (nx, tile_b), F32)],
        interpret=bool(interpret),
    )(gam_arr, *c["args"], *c["theta_args"], *model.const_args)

    B = c["B"]
    nc = problem.nc

    def fb_t(a):                                  # [T, (2,), d, Bp] -> [B,T,d]
        if dd_mode:
            v = dd.to_f64(DF(a[:, 0], a[:, 1]))
        else:
            v = a
        return jnp.moveaxis(v, -1, 0)[:B]

    u, phi, zl, zu, il, iu, c_raw, x_stage, xT = outs
    if dd_mode:
        xT = dd.to_f64(DF(xT[0], xT[1]))
    xT = jnp.moveaxis(xT, -1, 0)[:B]
    x = jnp.concatenate([fb_t(x_stage), xT[:, None, :]], axis=1)
    return (x, fb_t(u), fb_t(phi)[:, :, :nc] if nc else
            jnp.zeros((B, T, 0), x.dtype),
            fb_t(zl), fb_t(zu), fb_t(il), fb_t(iu),
            fb_t(c_raw)[:, :, :nc] if nc else jnp.zeros((B, T, 0), x.dtype))
