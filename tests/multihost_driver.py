"""Subprocess driver for the multi-host test: one JAX process of a 2-process
CPU 'cluster' (4 virtual devices each -> 8-device global mesh).

Usage: python multihost_driver.py <coordinator> <num_procs> <proc_id> <out.npz>
NOTE: run with a clean JAX config; this file must configure the platform
BEFORE the distributed runtime starts.
"""

import os
import sys

coordinator, num_procs, proc_id, out_path = (
    sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=4").strip()

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from ipddp2tpu import Options
from ipddp2tpu.models import concar
from ipddp2tpu.parallel.multihost import (global_mesh, initialize_distributed,
                                          solve_global)

initialize_distributed(coordinator_address=coordinator,
                       num_processes=num_procs, process_id=proc_id)
assert jax.process_count() == num_procs
assert len(jax.devices()) == 4 * num_procs

N = 8


def gen(i):
    theta, f_lim, tau_lim, x1 = concar.random_instance(
        jax.random.PRNGKey(1000 + i))
    bounds = jax.tree.map(lambda a: a[0], concar.bounds(
        f_lim[None], tau_lim[None]))
    u0 = concar.initial_controls()
    return bounds, x1, u0, theta


options = Options(optimality_tolerance=1e-7, max_iterations=300)
mesh = global_mesh()
sol, stats = solve_global(concar.problem(), gen, N, options=options,
                          mesh=mesh)

# gather the full solution onto every process for comparison
full = jax.tree.map(
    lambda a: np.asarray(jax.device_get(
        jax.jit(lambda x: x, out_shardings=jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec()))(a))), sol)

if proc_id == 0:
    np.savez(out_path,
             objective=full.objective, iterations=full.iterations,
             converged=full.converged, u=full.u,
             num_converged=int(stats.num_converged),
             num_instances=int(stats.num_instances))
    print("driver ok", flush=True)
jax.effects_barrier()
