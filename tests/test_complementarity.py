"""mu-relaxed complementarity rows (`compl_indices`).

The reference supports marking constraint rows for barrier relaxation
c[i] -= mu (reference: src/data/methods.jl:27-29, src/constraints.jl:16-50),
used for direct complementarity encodings lam * s = mu without extra slack
controls — its models ship both encodings (reference:
experiments/models/acrobot.jl implicit_contact_dynamics vs ..._slack). This
test solves the acrobot contact problem in the direct encoding and checks it
reaches the same optimum as the slack encoding."""

import jax.numpy as jnp

from ipddp2tpu import Options, Problem, solve, uniform_bounds
from ipddp2tpu.models import acrobot as m


NU = m.NTAU + m.NQ + 2 * m.NCONTACT      # tau, q+, lam, s (no sc slacks)
NC = m.NQ + 2 * m.NCONTACT               # 6 rows


def constraints(x, u, t, theta):
    """Direct encoding: last NCONTACT rows are lam*s, relaxed to lam*s = mu
    (reference: experiments/models/acrobot.jl implicit_contact_dynamics)."""
    q_prev, q = x[:m.NQ], x[m.NQ:]
    tau, q_next = u[0], u[1:3]
    lam, s = u[3:5], u[5:7]
    return jnp.concatenate([
        m.integrator_residual(theta, q_prev, q, q_next, tau, lam),
        s - m.joint_limit_gap(q_next),
        lam * s,
    ])


def stage_cost(x, u, t, theta):
    # no slack penalty in the direct encoding
    return 0.01 * m.DT * u[0] ** 2


def test_acrobot_direct_complementarity():
    prob = Problem(T=m.T, nx=m.NX, nu=NU, nc=NC,
                   dynamics=lambda x, u, t, th: jnp.concatenate(
                       [x[m.NQ:], u[m.NTAU:m.NTAU + m.NQ]]),
                   stage_cost=stage_cost,
                   terminal_cost=m.terminal_cost,
                   constraints=constraints,
                   compl_indices=(4, 5))
    lo = jnp.concatenate([jnp.array([-m.TORQUE_LIMIT]),
                          jnp.full((m.NQ,), -jnp.inf),
                          jnp.zeros((2 * m.NCONTACT,))])
    hi = jnp.concatenate([jnp.array([m.TORQUE_LIMIT]),
                          jnp.full((NU - 1,), jnp.inf)])
    u0 = jnp.concatenate([jnp.zeros((m.NTAU + m.NQ,)),
                          jnp.full((2 * m.NCONTACT,), 0.01)])
    sol = solve(prob, uniform_bounds(m.T, lo, hi), m.initial_state(),
                jnp.broadcast_to(u0, (m.T, NU)),
                theta=m.seed1_instance(),
                options=Options(optimality_tolerance=1e-7,
                                max_iterations=600))
    assert bool(sol.converged), int(sol.status)
    assert float(sol.primal_inf) < 1e-7
    # swing-up reached (terminal configuration near the upright goal)
    q_final = sol.x[-1, m.NQ:]
    assert abs(float(q_final[0]) - jnp.pi) < 0.15, q_final
    # complementarity holds at the solution: lam * s ~ mu -> 0
    lam, s = sol.u[:, 3:5], sol.u[:, 5:7]
    assert float(jnp.max(jnp.abs(lam * s))) < 1e-5
    # joint limit respected by the contact model
    assert float(jnp.max(jnp.abs(sol.x[:, 3]))) <= 0.5 * jnp.pi + 1e-6
