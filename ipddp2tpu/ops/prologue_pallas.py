"""Pallas TPU kernel: the fused iteration prologue in one launch.

Each solver iteration opens with three XLA dispatch groups before the
backward sweep (reference: src/derivatives.jl:31-35 evaluates the
codegenned derivative caches; src/backward_pass.jl:183-189 refreshes the
costate; src/dynamics.jl:29-31 contracts the dynamics Hessian):

    deriv  = evaluate_derivatives(x, u, phi)       # per-stage, independent
    lam    = costate_scan(deriv, phi)              # reverse-sequential
    second = cH_phi + contract_dynamics_hessian(x, u, lam[1:])

Measured at b1024 f32 these are ~11 of the ~75 ms iteration wall
(docs/PERF.md phase table) spread over per-stage jacobian kernels, a
T-stage scan dispatch chain, and a second jacobian sweep that re-reads the
trajectory from HBM. This kernel runs ALL of it in one reverse-time sweep:
grid = (batch_tiles, T) with time innermost and reversed via the index
map, the costate carry lives in VMEM scratch, and at grid step t the
traced per-stage function evaluates every jacobian/Hessian, contracts the
dynamics Hessian with the carried lam_{t+1}, and advances the costate —
so the trajectory is read from HBM once and no per-stage intermediate
round-trips.

The per-stage derivative code is the SAME `jax.jacfwd`/`jax.grad`
composition as derivatives.py, traced to a jaxpr outside the kernel
(constants hoisted — kernels may not capture array constants) and replayed
inside via `ops.ddeval.eval_jaxpr_mosaic`, exactly like the forward
megakernel's in-kernel model evaluation (ops/forward_pallas._TracedModel).
f32 only: the f64 endgame keeps its XLA prologue (the df64 backward
megakernel dominates that phase).

Semantics match the XLA prologue up to floating-point reassociation;
parity is pinned by tests/test_prologue_pallas.py in interpret mode on
short-horizon (T=16) problem variants — interpret mode unrolls the grid,
so full-horizon coverage is the on-chip bench.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .ddeval import eval_jaxpr_mosaic
from .forward_pallas import _theta_leaves, _theta_struct

F32 = jnp.float32


def _stage_fn(problem, theta_axes):
    """Per-stage prologue at one (x, u, t, phi, lam_next): every stagewise
    derivative, the phi+costate-contracted second-order block, and the
    costate recursion step — vmapped over the lane axis."""
    nx, nu, nc = problem.nx, problem.nu, problem.nc
    nz = nx + nu
    nc1 = max(nc, 1)

    def stage(x_t, u_t, t_, phi_t, lam_n, theta):
        z = jnp.concatenate([x_t, u_t])
        f = lambda zz: problem.dynamics(zz[:nx], zz[nx:], t_, theta)
        l = lambda zz: problem.stage_cost(zz[:nx], zz[nx:], t_, theta)

        fj = jax.jacfwd(f)(z)                         # [nx, nz]
        lg = jax.grad(l)(z)                           # [nz]
        lH = jax.jacfwd(jax.grad(l))(z)               # [nz, nz]

        if nc > 0:
            c = lambda zz: problem.eval_constraints(
                zz[:nx], zz[nx:], t_, theta)
            cj = jax.jacfwd(c)(z)                     # [nc, nz]
            cH = jax.jacfwd(jax.grad(
                lambda zz: jnp.dot(phi_t[:nc], c(zz))))(z)
            r = lg[:nx] + cj[:, :nx].T @ phi_t[:nc]
            if nc < nc1:                              # lane-pad to nc1
                cj = jnp.concatenate(
                    [cj, jnp.zeros((nc1 - nc, nz), z.dtype)])
        else:
            cj = jnp.zeros((nc1, nz), z.dtype)
            cH = jnp.zeros((nz, nz), z.dtype)
            r = lg[:nx]

        # lam_{t+1} . d2f as the Hessian of z -> <lam, f(z)> — same
        # pre-contraction as derivatives.contract_dynamics_hessian
        fc = jax.jacfwd(jax.grad(lambda zz: jnp.dot(lam_n, f(zz))))(z)
        second = cH + fc
        lam_t = r + fj[:, :nx].T @ lam_n              # costate recursion

        return (fj[:, :nx], fj[:, nx:], lg[:nx], lg[nx:],
                lH[:nx, :nx], lH[nx:, :nx], lH[nx:, nx:],
                cj[:, :nx], cj[:, nx:], second, lam_t)

    return jax.vmap(stage, in_axes=(-1, -1, None, -1, -1, theta_axes),
                    out_axes=-1)


@lru_cache(maxsize=32)
def _traced_prologue_cached(problem, theta_struct, tile_b):
    return _TracedPrologue(problem, theta_struct, tile_b)


class _TracedPrologue:
    """The per-stage prologue pre-traced to a jaxpr with hoisted constants
    (same rationale as forward_pallas._TracedModel: model functions close
    over arrays, which kernels may not capture)."""

    def __init__(self, problem, theta_struct, tile_b):
        nx, nu, nc = problem.nx, problem.nu, problem.nc
        nc1 = max(nc, 1)

        if theta_struct is None:
            theta_axes = None
            theta_t = None
        else:
            treedef, shapes = theta_struct
            theta_axes = jax.tree.unflatten(treedef, [-1] * len(shapes))
            theta_t = jax.tree.unflatten(
                treedef, [jnp.zeros(s + (tile_b,), F32) for s in shapes])

        vf = _stage_fn(problem, theta_axes)
        mk = lambda *shape: jnp.zeros(shape + (tile_b,), F32)
        args = (mk(nx), mk(nu), jnp.int32(0), mk(nc1), mk(nx), theta_t)
        # trace with x64 OFF: under the solver's enable_x64 the jacfwd
        # identity basis (jnp.eye) traces as int64 iota/add, which Mosaic
        # cannot lower and whose literals break the i32 replay
        with jax.enable_x64(False):
            self.closed = jax.make_jaxpr(vf)(*args)
            self.tree = jax.tree.structure(jax.eval_shape(vf, *args))

        # hoist constants -> kernel input arrays (+ reconstruction meta);
        # kept as NUMPY: this object is lru_cached and may be built while
        # an outer jit trace is active (see forward_pallas._TracedModel)
        self.const_args = []
        self.const_meta = []          # (kind, orig_shape, store_shape)
        for c in self.closed.consts:
            arr = np.asarray(c)
            shape = arr.shape
            lift = (1,) * max(0, 2 - len(shape)) + shape
            if np.issubdtype(arr.dtype, np.floating):
                store = arr.astype(np.float32).reshape(lift)
                self.const_meta.append(("f32", shape, store.shape))
            elif arr.dtype == np.bool_:
                store = arr.astype(np.int32).reshape(lift)
                self.const_meta.append(("bool", shape, store.shape))
            else:
                store = arr.astype(np.int32).reshape(lift)
                self.const_meta.append(("int", shape, store.shape))
            self.const_args.append(store)

    def read_consts(self, const_refs):
        vals = []
        for ref, (kind, shape, _) in zip(const_refs, self.const_meta):
            v = ref[...]
            if kind == "bool":
                vals.append(v.reshape(shape) != 0)
            else:
                vals.append(v.reshape(shape))
        return vals

    def eval(self, consts, x, u, t, phi, lam_n, theta):
        return eval_jaxpr_mosaic(self.closed, self.tree, consts,
                                 x, u, t, phi, lam_n, theta)


def _kernel(model: _TracedPrologue, theta_treedef, n_theta, theta_lifted,
            Tm1, refs):
    (x_ref, u_ref, phi_ref, lamT_ref, *rest) = refs
    theta_refs = rest[:n_theta]
    n_const = len(model.const_meta)
    const_refs = rest[n_theta:n_theta + n_const]
    outs = rest[n_theta + n_const:-1]
    lam_s = rest[-1]

    i = pl.program_id(1)

    @pl.when(i == 0)
    def _init():
        lam_s[...] = lamT_ref[...]

    theta = None
    if n_theta:
        leaves = []
        for r, lifted in zip(theta_refs, theta_lifted):
            v = r[...]
            if lifted:                # restore per-instance scalars -> [B]
                v = v[0]
            leaves.append(v)
        theta = jax.tree.unflatten(theta_treedef, leaves)

    consts = model.read_consts(const_refs)
    lam_next = lam_s[...]
    t = Tm1 - i
    vals = model.eval(consts, x_ref[0], u_ref[0], t, phi_ref[0],
                      lam_next, theta)
    for ref, v in zip(outs, vals[:-1]):
        ref[0] = v
    outs[-1][0] = vals[-1]            # lam_t (last out ref = last val)
    lam_s[...] = vals[-1]


def prologue_sweep_pallas(problem, theta, x, u, phi, lamT, *, tile_b=128,
                          interpret=None):
    """Fused prologue, one kernel launch.

    x: [B, T+1, nx] f32, u: [B, T, nu], phi: [B, T, nc], lamT: [B, nx]
    (= lTx, the terminal cost gradient — computed outside, it is one tiny
    per-batch jacobian). Returns a dict of stagewise arrays [B, T, ...]
    (fx, fu, lx, lu, lxx, lux, luu, cx, cu, second) plus lam [B, T+1, nx]
    with lam[:, T] = lamT — the exact contracts of evaluate_derivatives,
    costate_scan, and the `second` assembly batched."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, T = u.shape[0], u.shape[1]
    nx, nu, nc = problem.nx, problem.nu, problem.nc
    nz = nx + nu
    nc1 = max(nc, 1)
    in_dtype = x.dtype

    tile_b = min(tile_b, B)
    pad = (-B) % tile_b
    Bp = B + pad
    nb = Bp // tile_b
    padf = (lambda a: jnp.pad(a, [(0, pad)] + [(0, 0)] * (a.ndim - 1),
                              mode="edge")) if pad else (lambda a: a)
    tl_t = lambda a: jnp.moveaxis(padf(a), 0, -1).astype(F32)  # [T,...,B]
    tl_c = lambda a: jnp.moveaxis(padf(a), 0, -1).astype(F32)  # [...,B]

    if nc < nc1:
        phi = jnp.concatenate(
            [phi, jnp.zeros((B, T, nc1 - nc), phi.dtype)], axis=-1)

    leaves, treedef, _, lifted = _theta_leaves(theta)
    theta_args = [tl_c(l) for l in leaves]
    theta_dims = [a.shape[:-1] for a in theta_args]

    model = _traced_prologue_cached(problem, _theta_struct(theta), tile_b)

    Tm1 = np.int32(T - 1)
    zero32 = np.int32(0)

    def t_spec(*dims):                # time-indexed, REVERSED sweep
        block = (1,) + dims + (tile_b,)
        zeros = (zero32,) * len(dims)
        return pl.BlockSpec(block, lambda b, i: (Tm1 - i, *zeros, b),
                            memory_space=pltpu.VMEM)

    def const_spec(*dims):
        block = dims + (tile_b,)
        zeros = (zero32,) * len(dims)
        return pl.BlockSpec(block, lambda b, i: (*zeros, b),
                            memory_space=pltpu.VMEM)

    in_specs = [t_spec(nx), t_spec(nu), t_spec(nc1), const_spec(nx)]
    in_specs += [const_spec(*d) for d in theta_dims]
    in_specs += [
        pl.BlockSpec(ss, (lambda n: lambda b, i: (zero32,) * n)(len(ss)),
                     memory_space=pltpu.VMEM)
        for (_, _, ss) in model.const_meta]

    out_dims = [(nx, nx), (nx, nu), (nx,), (nu,),
                (nx, nx), (nu, nx), (nu, nu),
                (nc1, nx), (nc1, nu), (nz, nz), (nx,)]
    out_specs = tuple(t_spec(*d) for d in out_dims)
    vma = getattr(jax.typeof(x), "vma", frozenset())
    out_shape = tuple(jax.ShapeDtypeStruct((T,) + d + (Bp,), F32, vma=vma)
                      for d in out_dims)

    kernel = partial(_kernel, model, treedef, len(theta_args), lifted, Tm1)

    outs = pl.pallas_call(
        lambda *refs: kernel(list(refs)),
        grid=(nb, T),
        in_specs=in_specs, out_specs=out_specs, out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((nx, tile_b), F32)],
        interpret=bool(interpret),
    )(tl_t(x[:, :T]), tl_t(u), tl_t(phi), tl_c(lamT),
      *theta_args, *model.const_args)

    fb = lambda a: jnp.moveaxis(a, -1, 0)[:B].astype(in_dtype)
    (fx, fu, lx, lu, lxx, lux, luu, cx, cu, second, lam_st) = map(fb, outs)
    if nc < nc1:
        cx = cx[:, :, :nc]
        cu = cu[:, :, :nc]
    lam = jnp.concatenate(
        [lam_st, lamT[:, None, :].astype(in_dtype)], axis=1)
    return dict(fx=fx, fu=fu, lx=lx, lu=lu, lxx=lxx, lux=lux, luu=luu,
                cx=cx, cu=cu, second=second, lam=lam)
