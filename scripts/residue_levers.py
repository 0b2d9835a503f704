"""CPU experiment: which lever solves the bench-residue instances?

The round-5 on-chip autopsy (scripts/tpu_success_probe.py) showed the 9-15
per-2048 instances that survive the full rescue ladder all share one
signature: primal_inf ~1e-14, cs_inf pinned at the mu floor 1e-8 (< tol),
dual_inf plateaued at 2e-7..5e-6 — a dual-stationarity plateau at the
barrier floor, not a globalization failure. This script regenerates those
exact instances (same PRNG path as bench.py) and A/Bs candidate levers on a
from-scratch f64 solve:

    base     — the rescue configuration (sequential LS, ldl, refine 1)
    refine3  — refine_steps=3 (more iterative refinement on the graded KKT)
    eigh     — exact-inertia oracle
    bk       — reference-faithful Bunch-Kaufman
    resets   — ls_failure_resets=3
    qn       — quasi_newton (different H conditioning at the floor)

Usage: python scripts/residue_levers.py [--seed 1002] [--levers base,refine3]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from ipddp2tpu import Options
from ipddp2tpu.chunked import solve_chunked
from ipddp2tpu.models import concar

# instances from /tmp/success_probe_r5a.json (rescue-unsolved at k=1000)
RESIDUE = {
    1002: [3, 20, 199, 453, 572, 668, 937, 1579, 1620],
    1004: [47, 427, 432, 484, 548, 743, 789, 1099, 1134, 1198, 1573,
           1625, 1719, 1910, 1929],
}

LEVERS = {
    "base": {},
    "refine3": {"refine_steps": 3},
    "eigh": {"inertia_method": "eigh"},
    "bk": {"inertia_method": "bk"},
    "resets": {"ls_failure_resets": 3},
    "qn": {"quasi_newton": True},
}


def instances(seed, idx, batch=2048):
    keys = jax.random.split(jax.random.PRNGKey(seed), batch)
    thetas, f_lims, tau_lims, x1s = jax.vmap(concar.random_instance)(keys)
    pick = lambda a: a[np.asarray(idx)]
    return (jax.tree.map(pick, thetas), pick(f_lims), pick(tau_lims),
            pick(x1s))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seed", type=int, default=1002)
    ap.add_argument("--levers", default="base,refine3,eigh,bk,resets")
    ap.add_argument("--max-iter", type=int, default=1000)
    args = ap.parse_args()

    idx = RESIDUE[args.seed]
    thetas, f_lims, tau_lims, x1s = instances(args.seed, idx)
    n = len(idx)
    bounds = concar.bounds(f_lims, tau_lims)
    u0 = jnp.broadcast_to(concar.initial_controls(),
                          (n, concar.T, concar.NU))
    problem = concar.problem()

    for lever in args.levers.split(","):
        opts = Options(optimality_tolerance=1e-7,
                       max_iterations=args.max_iter,
                       auto_tune=False, **LEVERS[lever])
        t0 = time.time()
        sol = solve_chunked(problem, bounds, x1s, u0, theta=thetas,
                            options=opts, chunk=50, batched=True)
        conv = np.asarray(sol.converged)
        wall = time.time() - t0
        print(f"[{lever}] solved {conv.sum()}/{n} in {wall:.0f}s "
              f"(median k {np.median(np.asarray(sol.iterations)):.0f})",
              flush=True)
        for i in np.where(~conv)[0]:
            print(f"   inst {idx[i]}: status {int(np.asarray(sol.status)[i])}"
                  f" k={int(np.asarray(sol.iterations)[i])}"
                  f" dual={float(np.asarray(sol.dual_inf)[i]):.2e}"
                  f" cs={float(np.asarray(sol.cs_inf)[i]):.2e}", flush=True)


if __name__ == "__main__":
    main()
