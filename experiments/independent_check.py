"""Independent-solver cross-check (the reference's de-facto test strategy).

The reference verifies IPDDP2 by solving the SAME randomized instances with
IPOPT (reference: experiments/ipopt/concar.jl:36-50) and ProxDDP (reference:
experiments/proxddp/concar.py:14-32) and comparing objectives. This script is
our analog: it lowers a (Problem, Bounds, theta, x1, u0) instance to a plain
single-shooting NLP

    min_u  J(x(u), u)   s.t.  c_t(x_t, u_t) = 0,  lo <= u_t <= hi

(states eliminated by rollout) and solves it with scipy's SLSQP — a solver
that shares no code with ipddp2tpu — from the same initial controls.

Two certificates per instance:
  1. cold-start agreement: scipy's converged objective matches ours (same
     basin => tight match; different local optimum is reported, not failed);
  2. warm-start stationarity: scipy started AT our solution terminates
     immediately without improving it (our point satisfies the independent
     solver's own KKT test).

Usage:
    python experiments/independent_check.py [--problems concar ...]
        [--seeds 3] [--maxiter 400]
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
from ipddp2tpu.models import concar, double_integrator


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


def check_instance(name, problem, bounds, theta, x1, u0, ours, maxiter, tol=1e-7):
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

    t0 = time.time()
    cold = minimize(lambda v: float(obj(v)), np.asarray(u0).ravel(), **kw)
    cold_s = time.time() - t0

    ours_u = np.asarray(ours).ravel()
    warm = minimize(lambda v: float(obj(v)), ours_u,
                    **{**kw, "options": {"maxiter": 50, "ftol": 1e-10}})

    ours_obj = float(obj(jnp.asarray(ours_u)))
    improvement = ours_obj - warm.fun
    basin = abs(cold.fun - ours_obj) <= 1e-4 * max(1.0, abs(ours_obj))
    # A mu-barrier solution sits O(mu * #finite-bounds) above the true NLP
    # optimum (active controls rest ~mu/z inside their bounds); the final
    # barrier is mu = tol/10, so that's the honest stationarity slack.
    n_fin = int(np.isfinite(lo).sum() + np.isfinite(hi).sum())
    gap = 10.0 * (tol / 10.0) * max(n_fin, 1) + 1e-8
    print(f"  {name}: ours={ours_obj:.8e}  slsqp(cold)={cold.fun:.8e} "
          f"[{'same basin' if basin else 'different local opt'}; "
          f"{cold.nit} its, {cold_s:.0f}s]  "
          f"warm-start improvement={improvement:.2e} (barrier gap {gap:.0e})")
    # our point must be stationary for the independent solver too
    assert improvement <= gap, \
        f"{name}: independent solver improved our solution by {improvement}"
    return basin


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--problems", nargs="*",
                    default=["double_integrator", "concar"])
    ap.add_argument("--seeds", type=int, default=3)
    ap.add_argument("--maxiter", type=int, default=400)
    args = ap.parse_args()

    options = Options(optimality_tolerance=1e-7, max_iterations=600)
    agree = total = 0

    for name in args.problems:
        if name == "double_integrator":
            m = double_integrator
            b = jax.tree.map(lambda a: jnp.broadcast_to(a, (1,) + a.shape),
                             m.bounds())
            x1s = m.initial_state()[None]
            u0s = m.initial_controls()[None]
            sol = solve_batch(m.problem(), b, x1s, u0s, options=options)
            assert bool(sol.converged[0])
            ok = check_instance(name, m.problem(),
                                jax.tree.map(lambda a: a[0], b), None,
                                x1s[0], u0s[0], sol.u[0], args.maxiter)
            agree += ok
            total += 1
        elif name == "concar":
            keys = jax.random.split(jax.random.PRNGKey(1), args.seeds)
            thetas, f_lims, tau_lims, x1s = jax.vmap(
                concar.random_instance)(keys)
            bs = concar.bounds(f_lims, tau_lims)
            u0s = jnp.broadcast_to(concar.initial_controls(),
                                   (args.seeds, concar.T, concar.NU))
            sol = solve_batch(concar.problem(), bs, x1s, u0s, theta=thetas,
                              options=options)
            for i in range(args.seeds):
                if not bool(sol.converged[i]):
                    print(f"  concar seed {i + 1}: ours unconverged, skipped")
                    continue
                ok = check_instance(
                    f"concar seed {i + 1}", concar.problem(),
                    jax.tree.map(lambda a: a[i], bs),
                    jax.tree.map(lambda a: a[i], thetas),
                    x1s[i], u0s[i], sol.u[i], args.maxiter)
                agree += ok
                total += 1
        else:
            print(f"unknown problem {name}", file=sys.stderr)

    print(f"\n{total}/{total} stationarity certificates held; "
          f"{agree}/{total} cold-start basin agreements")


if __name__ == "__main__":
    main()
