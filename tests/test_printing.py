"""L5 reporting parity: banner, iteration table (with the reference's
wall/iter ms columns, reference: src/print.jl:13-29), exit message."""

import re

import jax.numpy as jnp

from ipddp2tpu import Options, solve
from ipddp2tpu.models import double_integrator as di
from ipddp2tpu.utils.printing import exit_message, solver_banner


def test_verbose_iteration_table(capsys):
    solver_banner()
    o = Options(optimality_tolerance=1e-7, verbose=True, print_frequency=10)
    sol = solve(di.problem(), di.bounds(), di.initial_state(),
                di.initial_controls(), options=o)
    print(exit_message(int(sol.status), bool(sol.converged)))
    out = capsys.readouterr().out

    assert "ipddp2tpu" in out                      # banner
    header = [l for l in out.splitlines() if "objective" in l]
    assert header and "wall(ms)" in header[0] and "iter(ms)" in header[0]
    rows = [l for l in out.splitlines()
            if re.match(r"^\s+\d+\s+[\d.e+-]+\s", l)]
    assert len(rows) >= 3                          # k = 0, 10, 20, 30
    # timing columns parse as positive floats
    for r in rows:
        cols = r.split()
        assert float(cols[-2]) > 0 and float(cols[-1]) > 0
    assert "Optimal solution found" in out
