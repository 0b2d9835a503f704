"""Real-TPU sharded + Pallas smoke check (closes the check_vma blind spot).

`solve_sharded` keeps `check_vma=True` on the Mosaic path but must drop it
for interpret-mode Pallas, so the CPU suite never type-checks the kernels'
vma plumbing (out_shape vma propagation) — only a real-TPU run does. This
script runs a small sharded solve on a 1-device TPU mesh with BOTH
megakernels forced on and check_vma active, then cross-checks the
objectives against the unsharded batch path.

Run as part of the verify flow after touching kernel out_shapes / vma
handling or parallel/mesh.py.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))
import jax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_default_matmul_precision", "highest")
cache = os.path.join(os.path.dirname(__file__), os.pardir, ".jax_cache")
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from ipddp2tpu import Options
from ipddp2tpu.batch import solve_batch
from ipddp2tpu.models import concar
from ipddp2tpu.parallel.mesh import make_mesh, solve_sharded

assert jax.default_backend() == "tpu", "this smoke check needs a real TPU"

B = int(os.environ.get("SMOKE_BATCH", "16"))
K = int(os.environ.get("SMOKE_ITERS", "40"))

keys = jax.random.split(jax.random.PRNGKey(3), B)
thetas, f_lims, tau_lims, x1s = jax.vmap(concar.random_instance)(keys)
bounds = concar.bounds(f_lims, tau_lims)
u0 = jnp.broadcast_to(concar.initial_controls(), (B, concar.T, concar.NU))
c32 = lambda a: (a.astype(jnp.float32)
                 if jnp.issubdtype(a.dtype, jnp.floating) else a)
bounds, x1s, u0, thetas = jax.tree.map(c32, (bounds, x1s, u0, thetas))

# all three kernels forced; vma check active on the Mosaic lowering
options = Options(optimality_tolerance=1e-3, max_iterations=K,
                  backward_kernel="pallas", forward_kernel="pallas",
                  ls_speculative=8, ls_spec_continue=True,
                  auto_tune=False, ldlt_unroll=False)

mesh = make_mesh()
t0 = time.time()
sol_s, stats = solve_sharded(problem := concar.problem(), bounds, x1s, u0,
                             theta=thetas, options=options, mesh=mesh)
ns = int(np.asarray(stats.num_converged))
print(f"sharded({len(mesh.devices.flat)} dev, check_vma on, both kernels): "
      f"{ns}/{B} converged in {time.time() - t0:.1f}s", flush=True)

sol_b = solve_batch(problem, bounds, x1s, u0, theta=thetas, options=options)
nb = int(np.asarray(jnp.sum(sol_b.converged)))
do = float(np.max(np.abs(np.asarray(sol_s.objective)
                         - np.asarray(sol_b.objective))))
print(f"unsharded: {nb}/{B}; max |objective delta| = {do:.3e}", flush=True)
assert ns == nb, (ns, nb)
assert do < 1e-4, do
print("SHARDED+PALLAS SMOKE OK")
