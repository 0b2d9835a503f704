"""Contact-implicit cartpole with joint friction.

The reference's cartpole_friction benchmark (reference:
experiments/ipddp2/cartpole_friction.jl, model
experiments/models/cartpole.jl): a cartpole whose slider and hinge joints have
Coulomb friction, discretized with an implicit variational midpoint
integrator. The trick (SURVEY.md §0): the next configuration q+ sits *in the
control vector*, the "dynamics" is the trivial shift
x' = [q, q+], and the integrator residual plus the friction complementarity
system are stagewise equality constraints with slack-smoothed complementarity
(the sc slacks are pushed to zero by a sum(sc) objective term).

    x = [q-, q] in R^4,  q = (cart position, pole angle)
    u = [F, q+, beta1(2), beta2(2), eta1(2), eta2(2), psi(2), s(2), sc(6)]
        in R^21
    nc = 14 equality rows, N = 101, dt = 0.05

Instance parameters theta: (mc, mp, l, friction_slider, friction_hinge)
(reference: experiments/ipddp2/cartpole_friction.jl:37-42).

Golden seed-1 anchor: 60 iterations, objective 9.29397628e-01
(reference: experiments/ipddp2/results/cartpole_friction.txt:2).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..problem import Bounds, Problem, uniform_bounds

NQ, NF, NCONTACT = 2, 1, 2
NX = 2 * NQ
NU = NF + NQ + 6 * NCONTACT + 6        # 21
NC = 2 * NQ + 4 * NCONTACT + 2         # 14
DT = 0.05
T = 100
GRAVITY = 9.81
FORCE_LIMIT = 10.0
Q_GOAL = (0.0, jnp.pi)


class Theta(NamedTuple):
    mc: jax.Array          # cart mass
    mp: jax.Array          # pole point mass
    l: jax.Array           # pole length
    friction: jax.Array    # [2] slider / hinge friction coefficients


def mass_matrix(theta: Theta, q):
    """(reference: experiments/models/cartpole.jl M_func)"""
    c = theta.mp * theta.l * jnp.cos(q[1])
    return jnp.array([[theta.mc + theta.mp, c],
                      [c, theta.mp * theta.l ** 2]])


def bias(theta: Theta, q, qd):
    """C(q, qd) qd - g(q) (reference: experiments/models/cartpole.jl C_func)"""
    coriolis = jnp.array(
        [-theta.mp * qd[1] * theta.l * jnp.sin(q[1]) * qd[1], 0.0])
    gravity = jnp.array([0.0, -theta.mp * GRAVITY * theta.l * jnp.sin(q[1])])
    return coriolis - gravity


def integrator_residual(theta: Theta, q_prev, q, q_next, force, lam):
    """Implicit variational midpoint residual
    (reference: experiments/models/cartpole.jl manipulator_fd)."""
    qm_minus = 0.5 * (q_prev + q)
    qm_plus = 0.5 * (q + q_next)
    qd_minus = (q - q_prev) / DT
    qd_plus = (q_next - q) / DT
    momentum = (mass_matrix(theta, qm_plus) @ qd_plus
                - mass_matrix(theta, qm_minus) @ qd_minus)
    c_mid = 0.5 * (bias(theta, qm_plus, qd_plus)
                   + bias(theta, qm_minus, qd_minus))
    b_force = jnp.array([force, 0.0])           # actuation on the cart only
    return momentum + DT * (c_mid - b_force - lam)   # contact Jacobian = I


def _split_controls(u):
    force = u[0]
    q_next = u[1:3]
    beta1 = u[3:5]
    beta2 = u[5:7]
    eta1 = u[7:9]
    eta2 = u[9:11]
    psi = u[11:13]
    s = u[13:15]
    sc = u[15:21]
    return force, q_next, beta1, beta2, eta1, eta2, psi, s, sc


def dynamics(x, u, t, theta):
    """Trivial shift x' = [q, q+]
    (reference: experiments/ipddp2/cartpole_friction.jl:52)."""
    return jnp.concatenate([x[NQ:], u[NF:NF + NQ]])


def stage_cost(x, u, t, theta):
    force = u[0]
    sc = u[15:21]
    return 0.01 * DT * force ** 2 + jnp.sum(sc)


def terminal_cost(x, theta):
    q_prev, q = x[:NQ], x[NQ:]
    qd = (q - q_prev) / DT
    dq = q - jnp.asarray(Q_GOAL, x.dtype)
    return 200.0 * jnp.dot(qd, qd) + 700.0 * jnp.dot(dq, dq)


def constraints(x, u, t, theta: Theta):
    """Friction-complementarity contact system, 14 rows
    (reference: experiments/models/cartpole.jl implicit_contact_dynamics_slack)."""
    q_prev, q = x[:NQ], x[NQ:]
    force, q_next, beta1, beta2, eta1, eta2, psi, s, sc = _split_controls(u)
    qd_plus = (q_next - q) / DT
    lam = jnp.array([beta1[0] - beta1[1], beta2[0] - beta2[1]])
    gamma1 = theta.friction[0] * (theta.mp + theta.mc) * GRAVITY
    gamma2 = theta.friction[1] * theta.mp * GRAVITY * theta.l
    return jnp.concatenate([
        integrator_residual(theta, q_prev, q, q_next, force, lam),
        jnp.array([qd_plus[0], -qd_plus[0]]) + psi[0] - eta1,
        jnp.array([qd_plus[1], -qd_plus[1]]) + psi[1] - eta2,
        jnp.array([gamma1 - jnp.sum(beta1) - s[0],
                   gamma2 - jnp.sum(beta2) - s[1],
                   psi[0] * s[0] - sc[0],
                   psi[1] * s[1] - sc[1]]),
        beta1 * eta1 - sc[2:4],
        beta2 * eta2 - sc[4:6],
    ])


def problem() -> Problem:
    return Problem(T=T, nx=NX, nu=NU, nc=NC, dynamics=dynamics,
                   contact=True,
                   stage_cost=stage_cost, terminal_cost=terminal_cost,
                   constraints=constraints)


def bounds(dtype=jnp.float64) -> Bounds:
    """|F| <= 10, q+ free, all contact variables and slacks >= 0
    (reference: experiments/ipddp2/cartpole_friction.jl:86-90)."""
    lo = jnp.concatenate([
        jnp.array([-FORCE_LIMIT], dtype),
        jnp.full((NQ,), -jnp.inf, dtype),
        jnp.zeros((6 * NCONTACT + 6,), dtype)])
    hi = jnp.concatenate([
        jnp.array([FORCE_LIMIT], dtype),
        jnp.full((NU - NF,), jnp.inf, dtype)])
    return uniform_bounds(T, lo, hi)


def initial_state(dtype=jnp.float64):
    return jnp.zeros((NX,), dtype)


def initial_controls(dtype=jnp.float64):
    u0 = jnp.concatenate([jnp.zeros((NF + NQ,), dtype),
                          jnp.full((6 * NCONTACT + 6,), 0.01, dtype)])
    return jnp.broadcast_to(u0, (T, NU))


def random_instance(key, dtype=jnp.float64):
    """Same parameter ranges as the reference generator
    (reference: experiments/ipddp2/cartpole_friction.jl:37-42)."""
    ks = jax.random.split(key, 4)
    return Theta(
        mc=0.9 + 0.2 * jax.random.uniform(ks[0], dtype=dtype),
        mp=0.15 + 0.1 * jax.random.uniform(ks[1], dtype=dtype),
        l=0.45 + 0.1 * jax.random.uniform(ks[2], dtype=dtype),
        friction=0.05 + 0.1 * jax.random.uniform(ks[3], (2,), dtype=dtype))


# Reference seed-1 parameters (reference:
# experiments/ipddp2/params/cartpole_friction.txt line 1).
SEED1_THETA = dict(mc=0.9146732708938586, mp=0.18492414895571863,
                   l=0.5198826683691469,
                   friction=(0.11282647403425017, 0.14149290036628315))
SEED1_GOLDEN_OBJECTIVE = 9.29397628e-01
SEED1_GOLDEN_ITERATIONS = 60


def seed1_instance(dtype=jnp.float64):
    return Theta(mc=jnp.asarray(SEED1_THETA["mc"], dtype),
                 mp=jnp.asarray(SEED1_THETA["mp"], dtype),
                 l=jnp.asarray(SEED1_THETA["l"], dtype),
                 friction=jnp.asarray(SEED1_THETA["friction"], dtype))
