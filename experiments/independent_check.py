"""Independent-solver cross-check (the reference's de-facto test strategy).

The reference verifies IPDDP2 by solving the SAME randomized instances with
IPOPT (reference: experiments/ipopt/concar.jl:36-50) and ProxDDP (reference:
experiments/proxddp/concar.py:14-32) and comparing objectives. This script is
our analog — covering ALL six benchmarks: it lowers a
(Problem, Bounds, theta, x1, u0) instance to a plain single-shooting NLP

    min_u  J(x(u), u)   s.t.  c_t(x_t, u_t) = 0,  lo <= u_t <= hi

(states eliminated by rollout) and solves it with scipy's SLSQP — a solver
that shares no code with ipddp2tpu — from the same initial controls.

Two certificates per instance:
  1. cold-start agreement: scipy's converged objective matches ours (same
     basin => tight match; different local optimum is reported, not failed);
  2. warm-start stationarity: scipy started AT our solution terminates
     without improving it (our point satisfies the independent solver's own
     KKT test).

On the contact problems (cartpole_friction, acrobot_contact, pushing_1_obs)
cold-start SLSQP on a 900-2100-variable dense NLP is slow and often fails —
the reference's own baselines degrade there too (IPOPT fails 11/100 and
ProxDDP 23/100 on pushing, BASELINE.md) — so cold starts default off for
them and the warm-start stationarity certificate is the check.

Usage:
    python experiments/independent_check.py [--problems concar ...]
        [--seeds 3] [--maxiter 400] [--cold-all]
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
from scipy.optimize import minimize

from ipddp2tpu import Options
from ipddp2tpu.batch import solve_batch
from ipddp2tpu.derivatives import evaluate_constraints, evaluate_objective


# problems where the dense single-shooting NLP is small enough for a
# cold-start SLSQP solve in reasonable time (T*nu <= ~1000 variables)
COLD_DEFAULT = {"double_integrator", "concar", "concar_quad"}
ALL_PROBLEMS = ["double_integrator", "concar", "concar_quad",
                "cartpole_friction", "acrobot_contact", "pushing_1_obs"]


def make_nlp(problem, theta, x1):
    """Single-shooting NLP callables over flat controls [T*nu]."""
    T, nu = problem.T, problem.nu

    def states(u_flat):
        u = u_flat.reshape(T, nu)

        def step(x_t, tu):
            t, u_t = tu
            x_n = problem.dynamics(x_t, u_t, t, theta)
            return x_n, x_t

        x_T, x_stk = jax.lax.scan(step, x1, (jnp.arange(T), u))
        return jnp.concatenate([x_stk, x_T[None]], axis=0), u

    def obj(u_flat):
        x, u = states(u_flat)
        return evaluate_objective(problem, theta, x, u)

    def cons(u_flat):
        x, u = states(u_flat)
        return evaluate_constraints(problem, theta, x, u).ravel()

    return (jax.jit(obj), jax.jit(jax.grad(obj)),
            jax.jit(cons), jax.jit(jax.jacfwd(cons)))


def check_instance(name, problem, bounds, theta, x1, u0, ours, maxiter,
                   cold_start=True, warm_maxiter=50, tol=1e-7):
    obj, grad, cons, cjac = make_nlp(problem, theta, x1)
    lo = np.broadcast_to(np.asarray(bounds.lower), (problem.T, problem.nu))
    hi = np.broadcast_to(np.asarray(bounds.upper), (problem.T, problem.nu))
    box = list(zip(np.clip(lo.ravel(), -1e20, 1e20),
                   np.clip(hi.ravel(), -1e20, 1e20)))
    eq = ({"type": "eq", "fun": lambda v: np.asarray(cons(v)),
           "jac": lambda v: np.asarray(cjac(v))},) if problem.nc else ()
    kw = dict(jac=lambda v: np.asarray(grad(v)), bounds=box,
              constraints=eq, method="SLSQP",
              options={"maxiter": maxiter, "ftol": 1e-10})

    ours_u = np.asarray(ours).ravel()
    ours_obj = float(obj(jnp.asarray(ours_u)))

    t0 = time.time()
    warm = minimize(lambda v: float(obj(v)), ours_u,
                    **{**kw, "options": {"maxiter": warm_maxiter,
                                         "ftol": 1e-10}})
    warm_s = time.time() - t0
    improvement = ours_obj - warm.fun

    # A mu-barrier solution sits O(mu * #finite-bounds) above the true NLP
    # optimum (active controls rest ~mu/z inside their bounds); the final
    # barrier is mu = tol/10, so that's the honest stationarity slack.
    n_fin = int(np.isfinite(lo).sum() + np.isfinite(hi).sum())
    gap = 10.0 * (tol / 10.0) * max(n_fin, 1) + 1e-8

    basin = None
    if cold_start:
        t0 = time.time()
        cold = minimize(lambda v: float(obj(v)), np.asarray(u0).ravel(), **kw)
        cold_s = time.time() - t0
        same = abs(cold.fun - ours_obj) <= 1e-4 * max(1.0, abs(ours_obj))
        basin = (bool(same), float(cold.fun))
        cold_txt = (f"slsqp(cold)={cold.fun:.8e} "
                    f"[{'same basin' if same else 'different local opt'}; "
                    f"{cold.nit} its, {cold_s:.0f}s]  ")
    else:
        cold_txt = "(cold start skipped: dense NLP too large)  "

    held = improvement <= gap
    print(f"  {name}: ours={ours_obj:.8e}  {cold_txt}"
          f"warm-start improvement={improvement:.2e} "
          f"(barrier gap {gap:.0e}; {warm.nit} its, {warm_s:.0f}s)"
          f"{'' if held else '  ** STATIONARITY VIOLATED **'}")
    # our point must be stationary for the independent solver too; reported
    # (not fatal) so a long sharded campaign finishes and tallies failures
    return basin, held


def instances(name, seeds, key=1):
    """(module, problem, bounds[b], thetas[b] | None, x1s[b], u0s[b])."""
    from ipddp2tpu.models import (acrobot, cartpole, concar, concar_quad,
                                  double_integrator, pushing)
    if name == "double_integrator":
        m = double_integrator
        b = jax.tree.map(lambda a: jnp.broadcast_to(a, (1,) + a.shape),
                         m.bounds())
        return (m.problem(), b, None, m.initial_state()[None],
                m.initial_controls()[None])
    mod = {"concar": concar, "concar_quad": concar_quad,
           "cartpole_friction": cartpole, "acrobot_contact": acrobot,
           "pushing_1_obs": pushing}[name]
    keys = jax.random.split(jax.random.PRNGKey(key), seeds)
    if name in ("concar", "concar_quad"):
        thetas, f_lims, tau_lims, x1s = jax.vmap(mod.random_instance)(keys)
        bounds = mod.bounds(f_lims, tau_lims)
    else:
        thetas = jax.vmap(mod.random_instance)(keys)
        bounds = jax.tree.map(
            lambda a: jnp.broadcast_to(a, (seeds,) + a.shape), mod.bounds())
        x1s = jnp.broadcast_to(mod.initial_state(), (seeds, mod.NX))
    u0s = jnp.broadcast_to(mod.initial_controls(),
                           (seeds, mod.T, mod.NU))
    return mod.problem(), bounds, thetas, x1s, u0s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--problems", nargs="*", default=ALL_PROBLEMS)
    ap.add_argument("--seeds", type=int, default=3)
    ap.add_argument("--maxiter", type=int, default=400)
    ap.add_argument("--warm-maxiter", type=int, default=50)
    ap.add_argument("--key", type=int, default=1,
                    help="base PRNG key: disjoint instance shards for "
                         "parallel runs")
    ap.add_argument("--cold-all", action="store_true",
                    help="force cold-start SLSQP on the contact problems too")
    args = ap.parse_args()

    options = Options(optimality_tolerance=1e-7, max_iterations=1000)
    agree = cold_total = certs = total = 0

    for name in args.problems:
        if name not in ALL_PROBLEMS:
            print(f"unknown problem {name}", file=sys.stderr)
            continue
        problem, bounds, thetas, x1s, u0s = instances(name, args.seeds,
                                              key=args.key)
        n = int(x1s.shape[0])
        sol = solve_batch(problem, bounds, x1s, u0s, theta=thetas,
                          options=options)
        cold = args.cold_all or name in COLD_DEFAULT
        ours_objs, cold_objs = [], []
        for i in range(n):
            if not bool(sol.converged[i]):
                print(f"  {name} seed {i + 1}: ours unconverged, skipped")
                continue
            basin, held = check_instance(
                f"{name} seed {i + 1}", problem,
                jax.tree.map(lambda a: a[i], bounds),
                None if thetas is None else
                jax.tree.map(lambda a: a[i], thetas),
                x1s[i], u0s[i], sol.u[i], args.maxiter,
                cold_start=cold, warm_maxiter=args.warm_maxiter)
            certs += int(held)
            total += 1
            if basin is not None:
                agree += int(basin[0])
                cold_total += 1
                ours_objs.append(float(sol.objective[i]))
                cold_objs.append(basin[1])
        # distribution-level comparison (the reference's two-solver
        # strategy, reference: experiments/proxddp/concar.py:24-32, applied
        # to OUR randomized instances): objective medians side by side
        if ours_objs and all(c is not None for c in cold_objs):
            mo, mc = float(np.median(ours_objs)), float(np.median(cold_objs))
            print(f"  {name}: median objective ours {mo:.6e} vs "
                  f"slsqp(cold) {mc:.6e} over {len(ours_objs)} instances "
                  f"(ratio {mo / mc:.4f})")

    print(f"\n{certs}/{total} stationarity certificates held; "
          f"{agree}/{cold_total} cold-start basin agreements")


if __name__ == "__main__":
    main()
