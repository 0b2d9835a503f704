"""Parity tests for the Pallas costate-sweep kernel (interpret mode).

Short horizons only: interpret-mode pallas_call unrolls the grid into the
compiled program (CLAUDE.md round-3), so T is kept small.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ipddp2tpu.backward import _costate_seq_single
from ipddp2tpu.ops.costate_pallas import costate_sweep_pallas

B, T, NX = 5, 12, 4


def _data(dtype, seed=0):
    k = jax.random.split(jax.random.PRNGKey(seed), 3)
    fx = jax.random.normal(k[0], (B, T, NX, NX), dtype) * 0.5
    r = jax.random.normal(k[1], (B, T, NX), dtype)
    lamT = jax.random.normal(k[2], (B, NX), dtype)
    return fx, r, lamT


@pytest.mark.parametrize("dtype,dd_mode,tol", [
    (jnp.float32, False, 1e-6),
    (jnp.float64, True, 1e-12),
])
def test_costate_kernel_matches_scan(dtype, dd_mode, tol):
    fx, r, lamT = _data(dtype)
    ref = jax.vmap(_costate_seq_single)(fx, r, lamT)
    out = costate_sweep_pallas(fx, r, lamT, nx=NX, dd_mode=dd_mode,
                               interpret=True)
    assert out.shape == (B, T + 1, NX)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=tol, atol=tol)


def test_costate_kernel_pads_ragged_batch():
    fx, r, lamT = _data(jnp.float32, seed=3)
    ref = jax.vmap(_costate_seq_single)(fx, r, lamT)
    out = costate_sweep_pallas(fx, r, lamT, nx=NX, tile_b=4,
                               interpret=True)   # B=5 pads to 8
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)
