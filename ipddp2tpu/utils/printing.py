"""Console reporting (the reference's L5 layer, src/print.jl:1-46).

Inside jit, per-iteration rows are emitted through `jax.debug.callback` —
the TPU-native analog of the reference's Printf-based table — rate-limited by
`print_frequency` like the reference (reference: src/options.jl:7,
src/print.jl:13-29).
"""

from __future__ import annotations

import jax

from ..problem import STATUS_MESSAGES

_BANNER = r"""
 ipddp2tpu — interior-point DDP (IPDDP2, arXiv:2504.08278), TPU-native
 stagewise equality constraints + control bounds | barrier + filter line search
"""

_HEADER = (" iter   objective     pr_inf    du_inf    cs_inf   lg(mu) "
           " lg(reg)   step    #ls")


def solver_banner():
    print(_BANNER)
    print(_HEADER)


def _row(k, objective, pr, du, cs, mu, reg, step, num_ls):
    import math

    lg = lambda v: math.log10(v) if v > 0 else float("-inf")
    print(f" {int(k):4d}  {float(objective): .4e}  {float(pr):.2e}  "
          f"{float(du):.2e}  {float(cs):.2e}  {lg(float(mu)):6.2f}  "
          f"{lg(float(reg)):6.2f}  {float(step):.1e}  {int(num_ls):3d}")


def iteration_logger(state, options):
    """Emit one table row from inside a jitted iteration (host callback)."""
    jax.lax.cond(
        (state.k % options.print_frequency) == 0,
        lambda s: jax.debug.callback(
            _row, s.k, s.objective, s.primal_inf, s.dual_inf, s.cs_inf,
            s.mu, s.reg_last, s.step_size, s.num_ls),
        lambda s: None,
        state)


def exit_message(status: int, converged: bool) -> str:
    """(reference: src/print.jl:31-46)"""
    if converged:
        return STATUS_MESSAGES[0]
    return STATUS_MESSAGES.get(status, f"Terminated with status {status}")
