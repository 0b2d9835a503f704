"""On-chip df64 exactness probe: does Mosaic preserve the error-free
transforms that XLA:CPU's compiled code contracts away?

Runs two chained-recursion Pallas kernels on the real TPU (the worst case
for error accumulation: T sequential dd ops through VMEM scratch, like the
forward/backward megakernels) and compares against the f64 reference:

  1. a 100-step dd multiply chain (pure arithmetic),
  2. a 100-step concar-dynamics chain through the ddeval interpreter
     (sin/cos + RK2, the forward kernel's actual inner loop).

Expected on-chip: ~1e-13 (the dd conditioning floor over 100 steps).
XLA:CPU interpret mode measures ~1e-9/1e-10 on the same programs (FMA
contraction in compiled code; see ops/df64.py docstring) — this probe is
the evidence that the Mosaic path does NOT share that degradation.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_default_matmul_precision", "highest")

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ipddp2tpu.models import concar
from ipddp2tpu.ops import df64 as dd
from ipddp2tpu.ops.ddeval import eval_dd_jaxpr, make_dd_jaxpr

B, T = 256, 100
rng = np.random.default_rng(2)
interpret = jax.default_backend() != "tpu"
print(f"backend={jax.default_backend()} interpret={interpret}")

# ---- probe 1: dd multiply chain ----
xd0 = dd.from_f64(jnp.asarray(rng.uniform(0.5, 1.0, (8, B))))
x0_arr = jnp.stack([xd0.hi, xd0.lo])
zi = np.int32(0)
C = 1.0000001


def kern_mul(x0_ref, oh, ol, xs):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        xs[0] = x0_ref[0]
        xs[1] = x0_ref[1]

    x = dd.DF(xs[0], xs[1])
    xn = dd.mul(x, dd._cst(dd._const(C), x.hi))
    xs[0], xs[1] = xn.hi, xn.lo
    oh[...] = xn.hi
    ol[...] = xn.lo


oh, ol = pl.pallas_call(
    kern_mul, grid=(T,),
    in_specs=[pl.BlockSpec((2, 8, B), lambda i: (zi, zi, zi),
                           memory_space=pltpu.VMEM)],
    out_specs=(pl.BlockSpec((8, B), lambda i: (zi, zi),
                            memory_space=pltpu.VMEM),) * 2,
    out_shape=(jax.ShapeDtypeStruct((8, B), jnp.float32),) * 2,
    scratch_shapes=[pltpu.VMEM((2, 8, B), jnp.float32)],
    interpret=interpret)(x0_arr)
ref = dd.to_f64(xd0) * (C ** T)
got = np.asarray(oh).astype(np.float64) + np.asarray(ol).astype(np.float64)
err1 = float(np.max(np.abs(got - np.asarray(ref)) / np.asarray(ref)))
print(f"mul-chain ({T} steps) rel err: {err1:.3e}")

# ---- probe 2: concar dynamics chain via the dd interpreter ----
x0 = jnp.asarray(np.stack([rng.uniform(0, 1, B), rng.uniform(0, 1, B),
                           rng.uniform(0.3, 0.9, B), rng.uniform(0.1, 0.5, B)]))
us = jnp.asarray(rng.uniform(-0.5, 0.5, (T, 10, B)))
vf = jax.vmap(lambda x, u: concar.dynamics(x, u, 0, None),
              in_axes=(-1, -1), out_axes=-1)
closed, tree = make_dd_jaxpr(
    vf, dd.DF(jnp.zeros((4, B), jnp.float32), jnp.zeros((4, B), jnp.float32)),
    dd.DF(jnp.zeros((10, B), jnp.float32), jnp.zeros((10, B), jnp.float32)))

xr = x0
for t in range(T):
    xr = vf(xr, us[t])

xd0 = dd.from_f64(x0)
ud = dd.from_f64(us)
x0_arr = jnp.stack([xd0.hi, xd0.lo])
u_arr = jnp.stack([ud.hi, ud.lo], axis=1)


def kern_dyn(x0_ref, u_ref, oh, ol, xs):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        xs[0] = x0_ref[0]
        xs[1] = x0_ref[1]

    x = dd.DF(xs[0], xs[1])
    u = dd.DF(u_ref[0, 0], u_ref[0, 1])
    xn = eval_dd_jaxpr(closed, tree, None, x, u)
    xs[0], xs[1] = xn.hi, xn.lo
    oh[...] = xn.hi
    ol[...] = xn.lo


oh, ol = pl.pallas_call(
    kern_dyn, grid=(T,),
    in_specs=[pl.BlockSpec((2, 4, B), lambda i: (zi, zi, zi),
                           memory_space=pltpu.VMEM),
              pl.BlockSpec((1, 2, 10, B), lambda i: (i, zi, zi, zi),
                           memory_space=pltpu.VMEM)],
    out_specs=(pl.BlockSpec((4, B), lambda i: (zi, zi),
                            memory_space=pltpu.VMEM),) * 2,
    out_shape=(jax.ShapeDtypeStruct((4, B), jnp.float32),) * 2,
    scratch_shapes=[pltpu.VMEM((2, 4, B), jnp.float32)],
    interpret=interpret)(x0_arr, u_arr)
got = np.asarray(oh).astype(np.float64) + np.asarray(ol).astype(np.float64)
err2 = float(np.max(np.abs(got - np.asarray(xr))))
print(f"dynamics-chain ({T} steps) abs err: {err2:.3e}")
