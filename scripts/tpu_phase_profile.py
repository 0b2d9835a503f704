"""On-TPU wall-time breakdown of one batched solver iteration's phases.

Times each jitted phase at batch 64 f32 on a mid-solve concar state:
derivatives, hessian contraction, costate scan, backward (megakernel vs
scan), rollout, full forward pass, and one whole iteration. Inputs are
perturbed per call (the axon layer memoizes identical (program, inputs)
runs) and timing is via host reads (block_until_ready does not block).
"""
import os, sys, time
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
from ipddp2tpu.backward import backward_pass, costate_scan
from ipddp2tpu.chunked import solve_chunked
from ipddp2tpu.derivatives import (contract_dynamics_hessian,
                                   evaluate_derivatives, relax_constraints)
from ipddp2tpu.forward import forward_pass, rollout
from ipddp2tpu.models import concar
from ipddp2tpu.problem import Bounds
from ipddp2tpu.solve import _nominal_trial, initialize, run

BATCH = int(os.environ.get("PROBE_BATCH", "64"))
WARM_ITERS = int(os.environ.get("PROBE_WARM", "30"))
REPS = int(os.environ.get("PROBE_REPS", "10"))

f32 = jnp.float32
prob = concar.problem()
keys = jax.random.split(jax.random.PRNGKey(7), BATCH)
thetas, f_lims, tau_lims, x1s = jax.vmap(concar.random_instance)(keys)
u0 = jnp.broadcast_to(concar.initial_controls(), (BATCH, concar.T, concar.NU))
cast = lambda a: a.astype(f32) if jnp.issubdtype(a.dtype, jnp.floating) else a
bounds, x1s, u0, thetas = jax.tree.map(
    cast, (concar.bounds(f_lims, tau_lims), x1s, u0, thetas))

options = Options(optimality_tolerance=1e-10, max_iterations=WARM_ITERS,
                  ldlt_unroll=False)

# advance to a mid-solve state (more representative than the first iterate)
t0 = time.time()
_, s = solve_chunked(prob, bounds, x1s, u0, theta=thetas, options=options,
                     chunk=WARM_ITERS, batched=True, return_state=True)
np.asarray(s.k)
print(f"warmup {WARM_ITERS} iters: {time.time()-t0:.1f}s", flush=True)


def timeit(name, fn, *args, reps=REPS):
    """Median wall of `reps` calls, each on 1e-6-perturbed fresh inputs."""
    perturb = jax.jit(lambda eps, *a: jax.tree.map(
        lambda x: x * (1 + eps) if jnp.issubdtype(x.dtype, jnp.floating)
        else x, a))
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0])          # compile + first run
    walls = []
    for i in range(reps):
        a_i = perturb(jnp.asarray(1e-6 * (i + 1), f32), *args)
        np.asarray(jax.tree.leaves(a_i)[0])      # exclude perturb cost
        t0 = time.time()
        out = fn(*a_i)
        np.asarray(jax.tree.leaves(out)[0])
        walls.append(time.time() - t0)
    print(f"{name:28s} {np.median(walls)*1e3:8.1f} ms  "
          f"(min {min(walls)*1e3:.1f})", flush=True)
    return out


vm = lambda f, *in_axes: jax.jit(jax.vmap(f, in_axes=in_axes))

deriv = timeit("derivatives", vm(
    lambda th, x, u, p: evaluate_derivatives(prob, th, x, u, p), 0, 0, 0, 0),
    thetas, s.x, s.u, s.phi)
lam = timeit("costate scan", vm(lambda d, p: costate_scan(d, p), 0, 0),
             deriv, s.phi)
second = timeit("hessian contraction", vm(
    lambda th, x, u, l: contract_dynamics_hessian(prob, th, x, u, l),
    0, 0, 0, 0), thetas, s.x, s.u, lam[:, 1:])
second = second + deriv.cH_phi
c_rel = jax.vmap(lambda c, m: relax_constraints(prob, c, m))(s.c_raw, s.mu)
nominal = (c_rel, s.il, s.iu, s.phi, s.zl, s.zu)

for kern in ("pallas", "xla"):
    opts_k = Options(optimality_tolerance=1e-10, ldlt_unroll=False,
                     backward_kernel=kern)
    bw = timeit(f"backward ({kern})", jax.jit(jax.vmap(
        lambda d, n, m, r, la, se: backward_pass(
            prob, d, n, m, r, opts_k, lam=la, second=se),
        in_axes=(0, 0, 0, 0, 0, 0))),
        deriv, nominal, s.mu, s.reg_last, lam, second)

timeit("rollout (one trial)", vm(
    lambda th, b, g, x, u, p, zl, zu: rollout(
        prob, th, b, g, x, u, p, zl, zu, jnp.asarray(1.0, f32)),
    0, Bounds(0, 0), 0, 0, 0, 0, 0, 0),
    thetas, bounds, bw.gains, s.x, s.u, s.phi, s.zl, s.zu)

timeit("forward pass (full LS)", jax.jit(jax.vmap(
    lambda th, b, g, nt, dL, mu, tc, lc, mp, fp: forward_pass(
        prob, th, b, g, nt, dL, mu, tc, lc, mp, fp, options),
    in_axes=(0, Bounds(0, 0), 0, 0, 0, 0, 0, 0, 0, 0))),
    thetas, bounds, bw.gains, jax.vmap(_nominal_trial)(s), bw.dL,
    s.mu, s.theta_curr, s.L_curr, s.min_primal_1, s.filter_pts)

for kern in ("pallas", "xla"):
    opts_k = Options(optimality_tolerance=1e-10, ldlt_unroll=False,
                     backward_kernel=kern, max_iterations=WARM_ITERS + 1000)
    # one full iteration via run() with k_limit = k+1
    step = jax.jit(jax.vmap(
        lambda st, b, th: run(prob, b, st, th, opts_k, k_limit=st.k + 1),
        in_axes=(0, Bounds(0, 0), 0)))
    timeit(f"full iteration ({kern})", step, s, bounds, thetas)
