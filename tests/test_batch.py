"""Batched and sharded solving: vmap over instances, shard_map over the
8-virtual-device CPU mesh (the multi-chip analog of a fake backend,
SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np

from ipddp2tpu import Options, solve
from ipddp2tpu.batch import batch_stats, solve_batch
from ipddp2tpu.models import concar
from ipddp2tpu.parallel import make_mesh, solve_sharded

OPTS = Options(optimality_tolerance=1e-6, max_iterations=600)


def _concar_batch(n, key=0):
    keys = jax.random.split(jax.random.PRNGKey(key), n)
    thetas, f_lims, tau_lims, x1s = jax.vmap(concar.random_instance)(keys)
    bounds = concar.bounds(f_lims, tau_lims)
    u0 = jnp.broadcast_to(concar.initial_controls(),
                          (n, concar.T, concar.NU))
    return thetas, bounds, x1s, u0


def test_vmap_batch_concar():
    n = 4
    thetas, bounds, x1s, u0 = _concar_batch(n)
    sol = solve_batch(concar.problem(), bounds, x1s, u0, theta=thetas,
                      options=OPTS)
    assert sol.converged.shape == (n,)
    stats = batch_stats(sol)
    assert int(stats.num_converged) == n, np.asarray(sol.status)
    assert float(stats.max_primal_inf) < 1e-6


def test_batch_matches_single():
    n = 3
    thetas, bounds, x1s, u0 = _concar_batch(n, key=7)
    batched = solve_batch(concar.problem(), bounds, x1s, u0, theta=thetas,
                          options=OPTS)
    one = solve(concar.problem(),
                jax.tree.map(lambda a: a[1], bounds),
                x1s[1], u0[1],
                theta=jax.tree.map(lambda a: a[1], thetas), options=OPTS)
    np.testing.assert_allclose(float(batched.objective[1]),
                               float(one.objective), rtol=1e-10)
    assert int(batched.iterations[1]) == int(one.iterations)


def test_shard_map_pallas_megakernel():
    """The Pallas backward megakernel must dispatch *inside* shard_map (the
    TPU bench path: sharded batch + fused backward). Regression: the
    pallas_call out_shapes carried no vma, so shard_map's check_vma rejected
    the solve on TPU backends. Parity vs the unsharded scan path at k=5
    (full-convergence iteration counts can drift across layouts)."""
    n = 2 * len(jax.devices())
    thetas, bounds, x1s, u0 = _concar_batch(n, key=11)
    opts5 = Options(optimality_tolerance=1e-12, max_iterations=5,
                    backward_kernel="pallas")
    sol, stats = solve_sharded(concar.problem(), bounds, x1s, u0,
                               theta=thetas, options=opts5,
                               mesh=make_mesh())
    ref = solve_batch(concar.problem(), bounds, x1s, u0, theta=thetas,
                      options=Options(optimality_tolerance=1e-12,
                                      max_iterations=5))
    np.testing.assert_allclose(np.asarray(sol.u), np.asarray(ref.u),
                               rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(np.asarray(sol.objective),
                               np.asarray(ref.objective), rtol=1e-9)
    assert int(stats.num_instances) == n


def test_shard_map_mesh():
    n_dev = len(jax.devices())
    assert n_dev == 8, "conftest should provide 8 virtual CPU devices"
    n = 2 * n_dev
    thetas, bounds, x1s, u0 = _concar_batch(n, key=3)
    sol, stats = solve_sharded(concar.problem(), bounds, x1s, u0,
                               theta=thetas, options=OPTS,
                               mesh=make_mesh())
    assert int(stats.num_instances) == n
    assert int(stats.num_converged) >= n - 1
    assert sol.converged.shape == (n,)
