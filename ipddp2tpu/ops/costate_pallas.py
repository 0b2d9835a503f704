"""Pallas TPU kernel: the costate refresh sweep in one launch.

The costate recursion lam_t = r_t + fx_t' lam_{t+1} (reference:
src/backward_pass.jl:183,189; r_t = lx + cx' phi) runs BEFORE the backward
sweep so the dynamics Hessians can be pre-contracted. Round-3 made it a
sequential `lax.scan` of matvecs ("seq" mode, 14x over the associative
scan at large batch), but the scan is still a T-stage XLA dispatch chain:
measured 4.8 ms/batch-iteration f32 and 9.8 ms df64-emulated at b1024 for
arithmetic that is microseconds. This kernel removes the dispatch chain the
same way the backward megakernel does (ops/backward_pallas.py): grid =
(batch_tiles, T) with the last axis innermost and time reversed via the
index map, the lam carry lives in VMEM scratch, per-stage fx/r blocks
stream HBM->VMEM through the automatic pipeline, batch rides the lanes.

dd_mode=True runs the same sweep in double-single (df64) arithmetic for
the f64 endgame (leading (hi, lo) axis per block, ops/df64.py), mirroring
ops/backward_pallas_df64.py.

Semantics match `backward.costate_scan(mode="seq")` exactly up to
floating-point reassociation; parity is pinned by
tests/test_costate_pallas.py in interpret mode.
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


def _kernel_f32(fx_ref, r_ref, lamT_ref, lam_ref, lam_s, *, nx):
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _init():
        lam_s[...] = lamT_ref[...]

    lam_next = lam_s[...]                 # [nx, B]
    fx = fx_ref[0]                        # [nx, nx, B]
    acc = r_ref[0]                        # [nx, B]
    # (fx' lam)[k] = sum_j fx[j, k] lam[j]: accumulate row-broadcasts like
    # the megakernel's Vx recursion (backward_pallas._kernel)
    for j in range(nx):
        acc = acc + fx[j] * lam_next[j][None, :]
    lam_ref[0] = acc
    lam_s[...] = acc


def _kernel_df64(fx_ref, r_ref, lamT_ref, lam_ref, lam_s, *, nx):
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _init():
        lam_s[...] = lamT_ref[...]

    lam_next = DF(lam_s[0], lam_s[1])     # [nx, B]
    fx = DF(fx_ref[0, 0], fx_ref[0, 1])   # [nx, nx, B]
    acc = DF(r_ref[0, 0], r_ref[0, 1])    # [nx, B]
    for j in range(nx):
        acc = dd.add(acc, dd.mul(
            DF(fx.hi[j], fx.lo[j]),
            DF(lam_next.hi[j][None, :], lam_next.lo[j][None, :])))
    lam_ref[0, 0] = acc.hi
    lam_ref[0, 1] = acc.lo
    lam_s[0] = acc.hi
    lam_s[1] = acc.lo


@partial(jax.jit, static_argnames=("nx", "dd_mode", "tile_b", "interpret"))
def costate_sweep_pallas(fx, r, lamT, *, nx, dd_mode=False, tile_b=128,
                         interpret=None):
    """Reverse costate sweep, one kernel launch.

    fx: [B, T, nx, nx], r: [B, T, nx] (= lx + cx' phi per stage),
    lamT: [B, nx]. Returns lam [B, T+1, nx] with lam[:, T] = lamT —
    the exact output contract of `backward.costate_scan` batched.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, T = fx.shape[0], fx.shape[1]
    in_dtype = fx.dtype

    tile_b = min(tile_b, B)
    pad = (-B) % tile_b
    padded = (lambda a: jnp.pad(a, [(0, pad)] + [(0, 0)] * (a.ndim - 1),
                                mode="edge")) if pad else (lambda a: a)
    Bp = B + pad
    nb = Bp // tile_b

    import numpy as np
    Tm1 = np.int32(T - 1)
    zero32 = np.int32(0)

    if dd_mode:
        def tl_t(a):                      # [B, T, ...] -> [T, 2, ..., B]
            m = jnp.moveaxis(padded(a), 0, -1)
            d = dd.from_f64(m)
            return jnp.stack([d.hi, d.lo], axis=1)

        def tl_c(a):                      # [B, ...] -> [2, ..., B]
            m = jnp.moveaxis(padded(a), 0, -1)
            d = dd.from_f64(m)
            return jnp.stack([d.hi, d.lo], axis=0)

        lead = (2,)
        kernel = _kernel_df64
        kdtype = F32
    else:
        tl_t = lambda a: jnp.moveaxis(padded(a), 0, -1)
        tl_c = tl_t
        lead = ()
        kernel = _kernel_f32
        kdtype = in_dtype

    def t_spec(*dims):
        block = (1,) + lead + dims + (tile_b,)
        zeros = (zero32,) * (len(dims) + len(lead))
        return pl.BlockSpec(block, lambda b, i: (Tm1 - i, *zeros, b),
                            memory_space=pltpu.VMEM)

    def const_spec(*dims):
        block = lead + dims + (tile_b,)
        zeros = (zero32,) * (len(dims) + len(lead))
        return pl.BlockSpec(block, lambda b, i: (*zeros, b),
                            memory_space=pltpu.VMEM)

    vma = getattr(jax.typeof(fx), "vma", frozenset())
    out_shape = jax.ShapeDtypeStruct((T,) + lead + (nx, Bp), kdtype,
                                     vma=vma)

    lam = pl.pallas_call(
        partial(kernel, nx=nx),
        grid=(nb, T),
        in_specs=[t_spec(nx, nx), t_spec(nx), const_spec(nx)],
        out_specs=t_spec(nx),
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM(lead + (nx, tile_b), kdtype)],
        interpret=bool(interpret),
    )(tl_t(fx), tl_t(r), tl_c(lamT))

    if dd_mode:
        lam64 = dd.to_f64(DF(lam[:, 0], lam[:, 1]))      # [T, nx, Bp]
        out = jnp.moveaxis(lam64, -1, 0)[:B]             # [B, T, nx]
        out = out.astype(in_dtype)
    else:
        out = jnp.moveaxis(lam, -1, 0)[:B]
    return jnp.concatenate([out, lamT[:, None, :].astype(in_dtype)],
                           axis=1)                       # [B, T+1, nx]
