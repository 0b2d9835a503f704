"""Pallas TPU kernel: batched pivoted LDL^T factor + solve + inertia.

The hardware-native form of `ops/ldlt.py` (the reference's per-stage LAPACK
Bunch-Kaufman call, reference: src/inertia_correction.jl:257-276) for the
f32 fast path. Motivation: XLA lays a [B, m, m] batch out with the two tiny
matrix dims on (sublane, lane), wasting ~90% of the VPU lanes for m ~ 14-35.
This kernel transposes to a batch-on-lanes layout [m, m, TILE_B] held in VMEM,
so every arithmetic op in the factorization is a full-width [*, 128] vector
op across problem instances.

Pivoting is the lane-hostile part (each instance needs its own permutation).
Instead of physical row/column swaps, the kernel uses *implicit* maximum-
|diagonal| pivoting: at step j every lane selects its pivot row r_j by a
masked argmax over the remaining diagonal (one sublane reduction), and all
row accesses go through one-hot contractions — turning per-lane gathers into
dense masked FMAs. Writing A = sum_j d_j w_j w_j^T with w_j = e_{r_j} + l_j,
the solve is forward/backward substitution in elimination order on the same
one-hot masks. Pivot signs give the exact inertia by Sylvester congruence.

Everything (factor, solve, refinement residual, inertia count) happens in one
kernel launch per batch tile — no HBM roundtrips between the steps.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_B = 128


def _kernel(k_ref, rhs_ref, x_ref, npos_ref, ok_ref, *, m, nk, refine):
    """One batch tile: k_ref [m, m, B], rhs_ref [m, nk, B] ->
    x_ref [m, nk, B], npos_ref [1, B] int32, ok_ref [1, B] int32."""
    A0 = k_ref[:]                       # [m, m, B] original matrix
    A = A0

    eliminated = jnp.zeros((m, A.shape[-1]), dtype=jnp.bool_)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (m, A.shape[-1]), 0)

    onehots = []
    lcols = []
    ds = []

    # --- factorization: m implicit-pivot elimination steps (static unroll) ---
    for j in range(m):
        diag = jnp.stack([A[i, i, :] for i in range(m)], axis=0)   # [m, B]
        cand = jnp.where(eliminated, -jnp.inf, jnp.abs(diag))
        # Mosaic requires an int32 index dtype for argmax lowering
        r = jax.lax.argmax(cand, 0, jnp.int32)                     # [B]
        onehot = (row_ids == r[None, :])                           # [m, B]
        d_j = jnp.sum(jnp.where(onehot, diag, 0.0), axis=0)        # [B]

        # l = A[:, r, :] / d  (column r via one-hot contraction), masked to
        # the rows not yet eliminated and not the pivot row itself
        col = jnp.zeros_like(diag)
        for i in range(m):
            col = col + jnp.where(onehot[i][None, :], A[:, i, :], 0.0)
        safe_d = jnp.where(d_j == 0.0, 1.0, d_j)
        l = col / safe_d[None, :]
        l = jnp.where(eliminated | onehot, 0.0, l)                 # [m, B]

        # rank-1 update A -= d * l l^T (outer over the two row dims)
        dl = l * d_j[None, :]                                      # [m, B]
        A = A - dl[:, None, :] * l[None, :, :]

        onehots.append(onehot)
        lcols.append(l)
        ds.append(d_j)
        eliminated = eliminated | onehot

    d = jnp.stack(ds, axis=0)                                      # [m, B]
    npos_ref[0, :] = jnp.sum((d > 0.0).astype(jnp.int32), axis=0)
    finite = jnp.all(jnp.isfinite(d), axis=0)
    nonzero = jnp.all(d != 0.0, axis=0)
    ok_ref[0, :] = (finite & nonzero).astype(jnp.int32)

    # --- solve W D W^T x = b with W = [w_0 .. w_{m-1}], w_j = e_{r_j} + l_j ---
    def solve(b):                       # b: [m, nk, B]
        res = b
        z = []
        for j in range(m):              # forward: z = W^{-1} b
            zj = jnp.sum(jnp.where(onehots[j][:, None, :], res, 0.0),
                         axis=0)        # [nk, B]
            w = onehots[j].astype(res.dtype) + lcols[j]
            res = res - w[:, None, :] * zj[None, :, :]
            z.append(zj)
        x = jnp.zeros_like(b)
        for j in range(m - 1, -1, -1):  # backward: W^T x = D^{-1} z
            safe_d = jnp.where(ds[j] == 0.0, 1.0, ds[j])
            rhs_j = z[j] / safe_d[None, :] - jnp.sum(
                lcols[j][:, None, :] * x, axis=0)                  # [nk, B]
            x = x + onehots[j][:, None, :] * rhs_j[None, :, :]
        return x

    b0 = rhs_ref[:]
    x = solve(b0)
    for _ in range(refine):             # iterative refinement, fused in-kernel
        # residual r = b - A0 x  via contraction over the column dim
        ax = jnp.zeros_like(b0)
        for i in range(m):
            ax = ax + A0[:, i, None, :] * x[i, None, :, :]
        x = x + solve(b0 - ax)
    x_ref[:] = x


@partial(jax.jit, static_argnames=("refine", "interpret"))
def ldlt_solve_batched_pallas(K, rhs, *, refine: int = 1,
                              interpret: bool = None):
    """Batched symmetric-indefinite solve with inertia, as one fused kernel.

    K: [B, m, m] float32, rhs: [B, m, k] float32. B must be a multiple of
    TILE_B (pad with identity systems). Returns (X [B, m, k],
    n_pos [B] int32, ok [B] bool).
    """
    if interpret is None:
        # run the kernel for real on TPU, interpreted elsewhere (tests/CPU)
        interpret = jax.default_backend() != "tpu"
    B, m, _ = K.shape
    nk = rhs.shape[-1]
    assert B % TILE_B == 0, f"batch {B} must be a multiple of {TILE_B}"
    kt = jnp.transpose(K, (1, 2, 0))        # [m, m, B]
    rt = jnp.transpose(rhs, (1, 2, 0))      # [m, nk, B]

    grid = (B // TILE_B,)
    # propagate the inputs' varying-mesh-axes so shard_map's check_vma
    # accepts the pallas_call out_shape (outputs are per-shard like inputs)
    vma = getattr(jax.typeof(K), "vma", frozenset())
    out_shapes = (
        jax.ShapeDtypeStruct((m, nk, B), K.dtype, vma=vma),
        jax.ShapeDtypeStruct((1, B), jnp.int32, vma=vma),
        jax.ShapeDtypeStruct((1, B), jnp.int32, vma=vma),
    )
    xt, npos, ok = pl.pallas_call(
        partial(_kernel, m=m, nk=nk, refine=refine),
        grid=grid,
        in_specs=[
            pl.BlockSpec((m, m, TILE_B), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m, nk, TILE_B), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((m, nk, TILE_B), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_B), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_B), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=out_shapes,
        interpret=interpret,
    )(kt, rt)
    return (jnp.transpose(xt, (2, 0, 1)), npos[0], ok[0].astype(bool))
