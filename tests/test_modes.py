"""Solver mode options: quasi-Newton, speculative line search, verbose,
warm start / checkpoint round trip."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from ipddp2tpu import Options, solve
from ipddp2tpu.models import concar, double_integrator as di
from ipddp2tpu.solve import initialize, run
from ipddp2tpu.utils import load_state, save_state
import pytest


def test_quasi_newton():
    """Gauss-Newton mode drops the second-order tensor contractions
    (reference: src/backward_pass.jl:102, options.quasi_newton)."""
    from ipddp2tpu.models import cartpole_swingup as cs

    # On an unconstrained-but-bounded problem the dropped dynamics curvature
    # only slows convergence; the solve still certifies the KKT point.
    sol = solve(cs.problem(), cs.bounds(), cs.initial_state(),
                cs.initial_controls(),
                options=Options(optimality_tolerance=1e-6, quasi_newton=True,
                                max_iterations=500))
    assert bool(sol.converged), int(sol.status)

    # On the bilinearly-constrained double integrator, Gauss-Newton stalls
    # with O(1e-3) residuals — the dropped constraint curvature matters (the
    # reference ships but never benchmarks this mode). Check it reaches the
    # optimum region.
    sol = solve(di.problem(), di.bounds(), di.initial_state(),
                di.initial_controls(),
                options=Options(optimality_tolerance=1e-5, quasi_newton=True,
                                max_iterations=500))
    np.testing.assert_allclose(float(sol.objective), di.GOLDEN_OBJECTIVE,
                               rtol=1e-2)
    assert float(sol.primal_inf) < 1e-2
    assert float(sol.dual_inf) < 1e-2


def test_speculative_matches_backtracking():
    theta, f_lim, tau_lim, x1 = concar.seed1_instance()
    base = Options(optimality_tolerance=1e-7)
    spec = Options(optimality_tolerance=1e-7, ls_speculative=30)
    s1 = solve(concar.problem(), concar.bounds(f_lim, tau_lim), x1,
               concar.initial_controls(), theta=theta, options=base)
    s2 = solve(concar.problem(), concar.bounds(f_lim, tau_lim), x1,
               concar.initial_controls(), theta=theta, options=spec)
    assert int(s1.iterations) == int(s2.iterations)
    np.testing.assert_allclose(float(s1.objective), float(s2.objective),
                               rtol=1e-9)


def test_hybrid_ls_matches_backtracking():
    """ls_spec_continue: K speculative candidates + sequential continuation
    below 2^-K must reach the backtracking optimum (same largest-acceptable
    -gamma semantics; iterations may drift a couple from vmap-vs-scalar
    rollout reassociation). K=2 forces the continuation path to actually
    run — concar backtracks below 1/4 routinely."""
    theta, f_lim, tau_lim, x1 = concar.seed1_instance()
    base = Options(optimality_tolerance=1e-7)
    hyb = Options(optimality_tolerance=1e-7, ls_speculative=2,
                  ls_spec_continue=True)
    s1 = solve(concar.problem(), concar.bounds(f_lim, tau_lim), x1,
               concar.initial_controls(), theta=theta, options=base)
    s2 = solve(concar.problem(), concar.bounds(f_lim, tau_lim), x1,
               concar.initial_controls(), theta=theta, options=hyb)
    assert bool(s1.converged) and bool(s2.converged)
    np.testing.assert_allclose(float(s2.objective), float(s1.objective),
                               rtol=1e-8)
    assert abs(int(s2.iterations) - int(s1.iterations)) <= 5


def test_checkpoint_warm_start(tmp_path):
    """Interrupt a solve, checkpoint, reload, resume: must finish like the
    uninterrupted run (warm-start API per SURVEY.md §5)."""
    opts_short = Options(optimality_tolerance=1e-7, max_iterations=10)
    opts_full = Options(optimality_tolerance=1e-7, max_iterations=500)
    prob, bounds = di.problem(), di.bounds()
    state = initialize(prob, None, bounds, di.initial_state(),
                       di.initial_controls(), opts_short)
    state = run(prob, bounds, state, None, opts_short)
    assert int(state.k) == 10

    path = os.path.join(tmp_path, "ckpt.npz")
    save_state(path, state)
    resumed = load_state(path)
    # clear the max-iteration stop and continue with the full budget
    resumed = resumed._replace(status=jnp.int32(0))
    final = run(prob, bounds, resumed, None, opts_full)
    assert bool(final.converged)
    np.testing.assert_allclose(float(final.objective), di.GOLDEN_OBJECTIVE,
                               rtol=1e-6)


def test_verbose_prints_table(capfd):
    """Verbose mode emits the banner, header, rate-limited iteration rows
    (via jax.debug.callback) and the exit message (reference:
    src/print.jl:13-46)."""
    from ipddp2tpu import Bound, Constraint, Dynamics, Objective, Solver

    T = di.T
    dyn = Dynamics(lambda x, u: di.dynamics(x, u, 0, None), 2, 3)
    objs = [Objective(lambda x, u: di.stage_cost(x, u, 0, None), 2, 3)] * T \
        + [Objective(lambda x, u: di.terminal_cost(x, None), 2, 0)]
    cons = [Constraint(lambda x, u: di.constraints(x, u, 0, None), 2, 3)] * T \
        + [Constraint(2, 0)]
    from ipddp2tpu.models.double_integrator import FORCE_LIMIT
    bnds = [Bound(np.array([-FORCE_LIMIT, 0.0, 0.0]),
                  np.array([FORCE_LIMIT, np.inf, np.inf]))] * T + [Bound(0)]
    s = Solver([dyn] * T, objs, cons, bounds=bnds,
               options=Options(optimality_tolerance=1e-7, verbose=True,
                               print_frequency=10))
    sol = s.solve(di.initial_state(), di.initial_controls())
    jax.effects_barrier()
    out, _ = capfd.readouterr()
    assert "iter" in out and "objective" in out        # header
    assert "  10  " in out                             # a rate-limited row
    assert "Optimal solution found" in out             # exit message
    assert bool(sol.converged)


@pytest.mark.slow
def test_ls_failure_resets_preserves_golden():
    """The rescue option must not change trajectories that never fail the
    line search (reference-equivalence when unused)."""
    from ipddp2tpu.models import cartpole as cp

    base = solve(cp.problem(), cp.bounds(), cp.initial_state(),
                 cp.initial_controls(), theta=cp.seed1_instance(),
                 options=Options(optimality_tolerance=1e-7))
    rescued = solve(cp.problem(), cp.bounds(), cp.initial_state(),
                    cp.initial_controls(), theta=cp.seed1_instance(),
                    options=Options(optimality_tolerance=1e-7,
                                    ls_failure_resets=3))
    assert int(base.iterations) == int(rescued.iterations)
    np.testing.assert_allclose(float(base.objective),
                               float(rescued.objective), rtol=1e-12)


def test_stall_window_spares_healthy_instances():
    """solve_chunked(stall_window=...) must not freeze instances that are
    converging (regression: baselining stall on the pre-first-chunk state —
    where initialize() zeroes the KKT errors — made the improvement clause
    unsatisfiable and froze everything at k=window)."""
    import numpy as np

    from ipddp2tpu.chunked import solve_chunked
    from ipddp2tpu.models import concar

    n = 4
    keys = jax.random.split(jax.random.PRNGKey(11), n)
    thetas, f_lims, tau_lims, x1s = jax.vmap(concar.random_instance)(keys)
    bounds = concar.bounds(f_lims, tau_lims)
    u0 = jnp.broadcast_to(concar.initial_controls(),
                          (n, concar.T, concar.NU))
    sol = solve_chunked(concar.problem(), bounds, x1s, u0, theta=thetas,
                        options=Options(optimality_tolerance=1e-7,
                                        max_iterations=400),
                        chunk=25, batched=True, stall_window=60)
    st = np.asarray(sol.status)
    assert (st != 9).all(), st          # nothing frozen
    assert np.asarray(sol.converged).all()
