"""Replay the reference's EXACT benchmark instances and diff per seed.

The reference commits the randomized parameters of every benchmark instance
(reference: experiments/ipddp2/params/*.txt, written at e.g.
experiments/ipddp2/concar.jl:169-173) precisely so other solvers can run
apples-to-apples comparisons (reference: experiments/proxddp/concar.py:24-32).
This script consumes those dumps, solves the same 100 instances with our
solver, and diffs per-seed {success, iterations, objective} against the
reference's committed results (reference: experiments/ipddp2/results/*.txt).

Unlike the randomized campaign (run_benchmarks.py), every row here is the
SAME instance the reference solved — success-rate and iteration-count deltas
are solver differences, not sampling noise.

Usage:
    python experiments/replay_reference.py [problem ...] [--ref PATH]
Problems: concar cartpole_friction acrobot_contact pushing_1_obs
(the reference commits no params dump for concar_quad, so it cannot be
replayed exactly — reference experiments/ipddp2/params/ has no
concar_quad.txt)
"""

import argparse
import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from ipddp2tpu import Options
from ipddp2tpu.batch import solve_batch
from ipddp2tpu.models import acrobot, cartpole, concar, concar_quad, pushing

REF = os.environ.get("REF", "/root/reference")


def load_params(name):
    path = os.path.join(REF, "experiments", "ipddp2", "params", f"{name}.txt")
    return np.loadtxt(path)


def load_results(name):
    """-> [seed, iterations, success, objective, primal] rows."""
    path = os.path.join(REF, "experiments", "ipddp2", "results",
                        f"{name}.txt")
    rows = []
    with open(path) as io:
        next(io)
        for line in io:
            m = re.split(r"\s+", line.strip())
            if len(m) < 5:
                continue
            rows.append((int(m[0]), int(m[1]), m[2] == "true",
                         float(m[3]), float(m[4])))
    return rows


def instances(name, p):
    """params matrix -> (problem, bounds[batched], x1s, u0s, thetas)."""
    n = p.shape[0]
    if name in ("concar", "concar_quad"):
        m = concar if name == "concar" else concar_quad
        thetas = concar.Theta(obstacles=jnp.asarray(
            p[:, 2:14].reshape(n, 4, 3)))
        bounds = m.bounds(jnp.asarray(p[:, 0]), jnp.asarray(p[:, 1]))
        x1s = jnp.asarray(p[:, 14:18])
        u0s = jnp.broadcast_to(m.initial_controls(), (n, m.T, m.NU))
        return m, bounds, x1s, u0s, thetas
    if name == "cartpole_friction":
        m = cartpole
        thetas = cartpole.Theta(mc=jnp.asarray(p[:, 0]),
                                mp=jnp.asarray(p[:, 1]),
                                l=jnp.asarray(p[:, 2]),
                                friction=jnp.asarray(p[:, 3:5]))
    elif name == "acrobot_contact":
        m = acrobot
        thetas = acrobot.Theta(m1=jnp.asarray(p[:, 0]),
                               l1=jnp.asarray(p[:, 2]),
                               m2=jnp.asarray(p[:, 4]),
                               l2=jnp.asarray(p[:, 6]))
    elif name == "pushing_1_obs":
        m = pushing
        thetas = pushing.Theta(zx=jnp.asarray(p[:, 0]),
                               zy=jnp.asarray(p[:, 1]),
                               c=jnp.asarray(p[:, 2]),
                               mu_fric=jnp.asarray(p[:, 3]),
                               obstacle=jnp.asarray(p[:, 4:7]))
    else:
        raise ValueError(name)
    bounds = jax.tree.map(lambda a: jnp.broadcast_to(a, (n,) + a.shape),
                          m.bounds())
    x1s = jnp.broadcast_to(m.initial_state(), (n, m.NX))
    u0s = jnp.broadcast_to(m.initial_controls(), (n, m.T, m.NU))
    return m, bounds, x1s, u0s, thetas


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("problems", nargs="*",
                    default=["concar", "cartpole_friction",
                             "acrobot_contact", "pushing_1_obs"])
    ap.add_argument("--tol", type=float, default=1e-7)
    ap.add_argument("--max-iter", type=int, default=1000)
    ap.add_argument("--inertia", default="ldl",
                    choices=["ldl", "eigh", "bk"],
                    help="inertia oracle; 'bk' is the reference-faithful "
                         "Bunch-Kaufman rook diagnostic (ops/bk.py)")
    ap.add_argument("--suffix", default="",
                    help="suffix for the results file name")
    args = ap.parse_args()

    options = Options(optimality_tolerance=args.tol,
                      max_iterations=args.max_iter,
                      inertia_method=args.inertia)
    here = os.path.dirname(os.path.abspath(__file__))
    outdir = os.path.join(here, "results")
    os.makedirs(outdir, exist_ok=True)

    for name in args.problems:
        p = load_params(name)
        ref = load_results(name)
        m, bounds, x1s, u0s, thetas = instances(name, p)
        sol = solve_batch(m.problem(), bounds, x1s, u0s, theta=thetas,
                          options=options)
        iters = np.asarray(sol.iterations)
        conv = np.asarray(sol.converged)
        objs = np.asarray(sol.objective)

        ours_ok = int(conv.sum())
        ref_ok = sum(r[2] for r in ref)
        both = [(r, i) for r, i in zip(ref, range(len(ref)))
                if r[2] and conv[i]]
        obj_close = sum(1 for r, i in both
                        if abs(objs[i] - r[3]) <= 1e-4 * max(1.0, abs(r[3])))
        it_ratio = np.array([iters[i] / max(r[1], 1) for r, i in both])
        med_ratio = float(np.median(it_ratio))
        med_obj_ours = float(np.median([objs[i] for _, i in both]))
        med_obj_ref = float(np.median([r[3] for r, _ in both]))
        print(f"{name}: ours {ours_ok}/{len(ref)} vs ref {ref_ok}/{len(ref)}"
              f" | same-objective (1e-4): {obj_close}/{len(both)}"
              f" | median iter-ratio ours/ref {med_ratio:.3f}"
              f" | median obj {med_obj_ours:.6e} vs {med_obj_ref:.6e}")
        mism = [(r[0], int(iters[i]), r[1], objs[i], r[3])
                for r, i in both
                if abs(objs[i] - r[3]) > 1e-4 * max(1.0, abs(r[3]))]
        for seed, oi, ri, oo, ro in mism[:10]:
            print(f"    seed {seed}: iters {oi} vs {ri}, "
                  f"obj {oo:.6e} vs {ro:.6e} (different local opt)")
        fail_ours = [r[0] for r, i in zip(ref, range(len(ref)))
                     if r[2] and not conv[i]]
        fail_ref = [r[0] for r, i in zip(ref, range(len(ref)))
                    if conv[i] and not r[2]]
        if fail_ours:
            print(f"    seeds ref solved but we did not: {fail_ours}")
        if fail_ref:
            print(f"    seeds we solved but ref did not: {fail_ref}")

        path = os.path.join(outdir, f"{name}_replay{args.suffix}.txt")
        with open(path, "w") as io:
            io.write(" seed  iterations  status     objective        "
                     "   primal        \n")
            for i in range(len(ref)):
                ok = bool(conv[i]) and int(sol.status[i]) == 0
                io.write(f" {i + 1:2d}     {int(iters[i]):5d}      "
                         f"{str(ok).lower():5s}    {objs[i]:.8e}    "
                         f"{float(sol.primal_inf[i]):.8e} \n")


if __name__ == "__main__":
    main()
