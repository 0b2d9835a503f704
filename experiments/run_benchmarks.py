"""Benchmark experiment driver (the reference's L6 experiments layer).

Runs randomized seeds of each paper benchmark — batched through `vmap`
instead of the reference's serial seed loop (reference:
experiments/ipddp2/concar.jl:28) — and writes per-seed result tables in the
reference's results format (reference: experiments/ipddp2/concar.jl:156-166):

     seed  iterations  status     objective           primal

Usage:
    python experiments/run_benchmarks.py [problem ...] [--seeds N] [--cpu]

Problems: concar concar_quad cartpole acrobot pushing double_integrator
(default: all). Results land in experiments/results/<problem>.txt.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import jax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("problems", nargs="*",
                    default=["concar", "concar_quad", "cartpole", "acrobot",
                             "pushing", "double_integrator"])
    ap.add_argument("--seeds", type=int, default=100)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--tol", type=float, default=1e-7)
    args = ap.parse_args()

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    import jax.numpy as jnp
    import numpy as np

    from ipddp2tpu import Options
    from ipddp2tpu.batch import solve_batch
    from ipddp2tpu.models import (acrobot, cartpole, concar, concar_quad,
                                  double_integrator, pushing)

    options = Options(optimality_tolerance=args.tol, max_iterations=1000)
    outdir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "results")
    os.makedirs(outdir, exist_ok=True)

    def run(name, problem, bounds, x1s, u0s, thetas):
        t0 = time.time()
        sol = solve_batch(problem, bounds, x1s, u0s, theta=thetas,
                          options=options)
        jax.block_until_ready(sol.converged)
        wall = time.time() - t0
        n = sol.converged.shape[0]
        path = os.path.join(outdir, f"{name}.txt")
        with open(path, "w") as io:
            io.write(" seed  iterations  status     objective        "
                     "   primal        \n")
            for i in range(n):
                ok = bool(sol.converged[i]) and int(sol.status[i]) == 0
                io.write(f" {i + 1:2d}     {int(sol.iterations[i]):5d}      "
                         f"{str(ok).lower():5s}    "
                         f"{float(sol.objective[i]):.8e}    "
                         f"{float(sol.primal_inf[i]):.8e} \n")
        conv = int(jnp.sum(sol.converged))
        med = float(jnp.median(sol.iterations))
        print(f"{name}: {conv}/{n} converged, median iters {med:.0f}, "
              f"batch wall {wall:.1f}s -> {path}")

    n = args.seeds

    def batched(module, seed1_has_bounds):
        keys = jax.random.split(jax.random.PRNGKey(1), n)
        if seed1_has_bounds:
            thetas, f_lims, tau_lims, x1s = jax.vmap(
                module.random_instance)(keys)
            bounds = module.bounds(f_lims, tau_lims)
        else:
            thetas = jax.vmap(module.random_instance)(keys)
            bounds = jax.tree.map(
                lambda a: jnp.broadcast_to(a, (n,) + a.shape),
                module.bounds())
            x1s = jnp.broadcast_to(module.initial_state(),
                                   (n, module.NX))
        u0s = jnp.broadcast_to(module.initial_controls(),
                               (n, module.T, module.NU))
        return thetas, bounds, x1s, u0s

    for name in args.problems:
        if name == "double_integrator":
            m = double_integrator
            bounds = jax.tree.map(
                lambda a: jnp.broadcast_to(a, (1,) + a.shape), m.bounds())
            run(name, m.problem(), bounds,
                m.initial_state()[None], m.initial_controls()[None], None)
        elif name in ("concar", "concar_quad"):
            m = concar if name == "concar" else concar_quad
            thetas, bounds, x1s, u0s = batched(m, True)
            run(name, m.problem(), bounds, x1s, u0s, thetas)
        elif name == "cartpole":
            thetas, bounds, x1s, u0s = batched(cartpole, False)
            run("cartpole_friction", cartpole.problem(), bounds, x1s, u0s,
                thetas)
        elif name == "acrobot":
            thetas, bounds, x1s, u0s = batched(acrobot, False)
            run("acrobot_contact", acrobot.problem(), bounds, x1s, u0s,
                thetas)
        elif name == "pushing":
            thetas, bounds, x1s, u0s = batched(pushing, False)
            run("pushing_1_obs", pushing.problem(), bounds, x1s, u0s, thetas)
        else:
            print(f"unknown problem {name}", file=sys.stderr)


if __name__ == "__main__":
    main()
