"""Mixed-precision continuation must certify the same optimum as pure f64."""

import numpy as np

from ipddp2tpu import Options
from ipddp2tpu.mixed import solve_mixed
from ipddp2tpu.models import concar, double_integrator as di


def test_mixed_double_integrator():
    sol = solve_mixed(di.problem(), di.bounds(), di.initial_state(),
                      di.initial_controls(),
                      options=Options(optimality_tolerance=1e-7))
    assert bool(sol.converged), int(sol.status)
    np.testing.assert_allclose(float(sol.objective), di.GOLDEN_OBJECTIVE,
                               rtol=1e-6)
    assert float(sol.dual_inf) < 1e-7


def test_mixed_concar():
    theta, f_lim, tau_lim, x1 = concar.seed1_instance()
    sol = solve_mixed(concar.problem(), concar.bounds(f_lim, tau_lim), x1,
                      concar.initial_controls(), theta=theta,
                      options=Options(optimality_tolerance=1e-7))
    assert bool(sol.converged), int(sol.status)
    # a 1e-7-KKT point within 1e-4 of the golden objective (the scaled dual
    # tolerance admits ~1e-5 objective spread on this L1-slack problem)
    np.testing.assert_allclose(float(sol.objective),
                               concar.SEED1_GOLDEN_OBJECTIVE, rtol=1e-4)
    assert float(sol.dual_inf) < 1e-7
    # total = f32 phase (~95) + short f64 endgame (~6)
    assert int(sol.iterations) < 130, int(sol.iterations)
