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
                             "pushing", "double_integrator", "quadrotor",
                             "cartpole_swingup"])
    ap.add_argument("--seeds", type=int, default=100)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--tol", type=float, default=1e-7)
    ap.add_argument("--inertia", default="auto",
                    choices=["auto", "ldl", "eigh", "bk"],
                    help="inertia oracle; 'auto' (default) resolves per "
                         "problem (bk on contact problems, else ldl); 'bk' "
                         "is the reference-faithful Bunch-Kaufman rook "
                         "diagnostic (ops/bk.py)")
    ap.add_argument("--suffix", default="",
                    help="suffix for the results file name")
    args = ap.parse_args()

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    import jax.numpy as jnp
    import numpy as np

    from ipddp2tpu import Options
    from ipddp2tpu.batch import solve_batch
    from ipddp2tpu.models import (acrobot, cartpole, cartpole_swingup,
                                  concar, concar_quad, double_integrator,
                                  pushing, quadrotor)

    options = Options(optimality_tolerance=args.tol, max_iterations=1000,
                      inertia_method=args.inertia)
    here = os.path.dirname(os.path.abspath(__file__))
    outdir = os.path.join(here, "results")
    paramdir = os.path.join(here, "params")
    os.makedirs(outdir, exist_ok=True)
    os.makedirs(paramdir, exist_ok=True)

    def write_params(name, rows):
        """Per-seed instance parameters, one whitespace-joined row per seed,
        in the reference's layout (reference: experiments/ipddp2/concar.jl:
        169-173) so an external solver can replay our exact instances."""
        path = os.path.join(paramdir, f"{name}.txt")
        with open(path, "w") as io:
            for row in np.asarray(rows):
                io.write(" ".join(repr(float(v)) for v in row) + "\n")
        print(f"  params -> {path}")

    def run(name, problem, bounds, x1s, u0s, thetas):
        t0 = time.time()
        sol = solve_batch(problem, bounds, x1s, u0s, theta=thetas,
                          options=options)
        jax.block_until_ready(sol.converged)
        wall = time.time() - t0
        n = sol.converged.shape[0]
        path = os.path.join(outdir, f"{name}{args.suffix}.txt")
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
            # [F_lim, tau_lim, obs1..4 (x,y,r), x1] (reference:
            # experiments/ipddp2/concar.jl:153)
            f_lims = np.asarray(bounds.upper)[:, 0, 0]
            tau_lims = np.asarray(bounds.upper)[:, 0, 1]
            write_params(name, np.column_stack(
                [f_lims, tau_lims,
                 np.asarray(thetas.obstacles).reshape(n, 12),
                 np.asarray(x1s)]))
            run(name, m.problem(), bounds, x1s, u0s, thetas)
        elif name == "cartpole":
            thetas, bounds, x1s, u0s = batched(cartpole, False)
            # [mc, mp, l, friction1, friction2] (reference:
            # experiments/ipddp2/cartpole_friction.jl:123)
            write_params("cartpole_friction", np.column_stack(
                [np.asarray(thetas.mc), np.asarray(thetas.mp),
                 np.asarray(thetas.l), np.asarray(thetas.friction)]))
            run("cartpole_friction", cartpole.problem(), bounds, x1s, u0s,
                thetas)
        elif name == "acrobot":
            thetas, bounds, x1s, u0s = batched(acrobot, False)
            # [m1, I1, l1, lc1, m2, I2, l2, lc2]; I=0.333, lc=0.5 are fixed
            # (reference: experiments/ipddp2/acrobot_contact.jl:38-47,131)
            const = np.full(n, 0.333), np.full(n, 0.5)
            write_params("acrobot_contact", np.column_stack(
                [np.asarray(thetas.m1), const[0], np.asarray(thetas.l1),
                 const[1], np.asarray(thetas.m2), const[0],
                 np.asarray(thetas.l2), const[1]]))
            run("acrobot_contact", acrobot.problem(), bounds, x1s, u0s,
                thetas)
        elif name == "quadrotor":
            # random goal + initial position (no reference counterpart;
            # BASELINE.json config "Batched concar/quadrotor")
            m = quadrotor
            keys = jax.random.split(jax.random.PRNGKey(1), n)
            thetas, x1s = jax.vmap(m.random_instance)(keys)
            bounds = jax.tree.map(
                lambda a: jnp.broadcast_to(a, (n,) + a.shape), m.bounds())
            u0s = jnp.broadcast_to(m.initial_controls(), (n, m.T, m.NU))
            write_params("quadrotor", np.column_stack(
                [np.asarray(thetas.goal), np.asarray(x1s[:, :3])]))
            run("quadrotor", m.problem(), bounds, x1s, u0s, thetas)
        elif name == "cartpole_swingup":
            # random initial cart position / pole angle (no reference
            # counterpart; BASELINE.json config "Cartpole swing-up")
            m = cartpole_swingup
            keys = jax.random.split(jax.random.PRNGKey(1), n)
            x1s = jax.vmap(m.random_instance)(keys)
            bounds = jax.tree.map(
                lambda a: jnp.broadcast_to(a, (n,) + a.shape), m.bounds())
            u0s = jnp.broadcast_to(m.initial_controls(), (n, m.T, m.NU))
            write_params("cartpole_swingup", np.asarray(x1s[:, :2]))
            run("cartpole_swingup", m.problem(), bounds, x1s, u0s, None)
        elif name == "pushing":
            thetas, bounds, x1s, u0s = batched(pushing, False)
            # [zx, zy, c, mu_fric, obstacle (x,y,r)] (reference:
            # experiments/ipddp2/pushing_1_obs.jl:157)
            write_params("pushing_1_obs", np.column_stack(
                [np.asarray(thetas.zx), np.asarray(thetas.zy),
                 np.asarray(thetas.c), np.asarray(thetas.mu_fric),
                 np.asarray(thetas.obstacle)]))
            run("pushing_1_obs", pushing.problem(), bounds, x1s, u0s, thetas)
        else:
            print(f"unknown problem {name}", file=sys.stderr)


if __name__ == "__main__":
    main()
