"""Acrobot with elbow joint-limit contact.

The reference's acrobot_contact benchmark (reference:
experiments/ipddp2/acrobot_contact.jl, model experiments/models/acrobot.jl):
an underactuated double pendulum (elbow torque only) whose elbow joint has
hard limits at +-pi/2, treated as unilateral contacts. Same contact-implicit
encoding as the cartpole: q+ lives in the control vector, trivial-shift
dynamics, and the variational midpoint residual + joint-limit complementarity
(lam . s = sc with gap s = phi(q+)) as stagewise equalities.

    x = [q-, q] in R^4,  q = (shoulder angle, elbow angle)
    u = [tau, q+, lam(2), s(2), sc(2)] in R^9
    nc = 6 equality rows, N = 101, dt = 0.05

Instance parameters theta: (m1, l1, m2, l2) randomized; I1 = I2 = 0.333,
lc1 = lc2 = 0.5 fixed (reference: experiments/ipddp2/acrobot_contact.jl:39-48).

Golden seed-1 anchor: 157 iterations, objective 1.33119481e+00
(reference: experiments/ipddp2/results/acrobot_contact.txt:2).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..problem import Bounds, Problem, uniform_bounds

NQ, NTAU, NCONTACT = 2, 1, 2
NX = 2 * NQ
NU = NTAU + NQ + 3 * NCONTACT          # 9
NC = NQ + 2 * NCONTACT                 # 6
DT = 0.05
T = 100
GRAVITY = 9.81
TORQUE_LIMIT = 8.0
Q_GOAL = (jnp.pi, 0.0)
I1 = 0.333
I2 = 0.333
LC1 = 0.5
LC2 = 0.5


class Theta(NamedTuple):
    m1: jax.Array
    l1: jax.Array
    m2: jax.Array
    l2: jax.Array


def mass_matrix(theta: Theta, q):
    """(reference: experiments/models/acrobot.jl M_func)"""
    a = (I1 + I2 + theta.m2 * theta.l1 ** 2
         + 2.0 * theta.m2 * theta.l1 * LC2 * jnp.cos(q[1]))
    b = I2 + theta.m2 * theta.l1 * LC2 * jnp.cos(q[1])
    return jnp.array([[a, b], [b, I2]])


def bias(theta: Theta, q, qd):
    """C~(q, qd) qd - tau_g(q) (reference: experiments/models/acrobot.jl
    C_func, tau_g_func, C~_func)."""
    h = theta.m2 * theta.l1 * LC2 * jnp.sin(q[1])
    coriolis = jnp.array([
        -2.0 * h * qd[1] * qd[0] - h * qd[1] * qd[1],
        h * qd[0] * qd[0],
    ])
    g1 = (-theta.m1 * GRAVITY * LC1 * jnp.sin(q[0])
          - theta.m2 * GRAVITY * (theta.l1 * jnp.sin(q[0])
                                  + LC2 * jnp.sin(q[0] + q[1])))
    g2 = -theta.m2 * GRAVITY * LC2 * jnp.sin(q[0] + q[1])
    return coriolis - jnp.array([g1, g2])


def joint_limit_gap(q):
    """phi(q) >= 0 elbow limits at +-pi/2
    (reference: experiments/models/acrobot.jl phi_func)."""
    return jnp.array([0.5 * jnp.pi - q[1], q[1] + 0.5 * jnp.pi])


def integrator_residual(theta: Theta, q_prev, q, q_next, tau, lam):
    """Variational midpoint residual with joint damping 0.5 * qd+
    (reference: experiments/models/acrobot.jl manipulator_fd)."""
    qm_minus = 0.5 * (q_prev + q)
    qm_plus = 0.5 * (q + q_next)
    qd_minus = (q - q_prev) / DT
    qd_plus = (q_next - q) / DT
    momentum = (mass_matrix(theta, qm_plus) @ qd_plus
                - mass_matrix(theta, qm_minus) @ qd_minus)
    c_mid = 0.5 * (bias(theta, qm_plus, qd_plus)
                   + bias(theta, qm_minus, qd_minus))
    b_tau = jnp.array([0.0, tau])               # elbow actuation only
    # contact Jacobian P = [0 -1; 0 1]; P^T lam = [0, lam2 - lam1]
    p_lam = jnp.array([0.0, lam[1] - lam[0]])
    return momentum + DT * (c_mid - b_tau - p_lam + 0.5 * qd_plus)


def dynamics(x, u, t, theta):
    return jnp.concatenate([x[NQ:], u[NTAU:NTAU + NQ]])


def stage_cost(x, u, t, theta):
    tau = u[0]
    sc = u[7:9]
    return 0.01 * DT * tau ** 2 + 2.0 * jnp.sum(sc)


def terminal_cost(x, theta):
    q_prev, q = x[:NQ], x[NQ:]
    qd = (q - q_prev) / DT
    dq = q - jnp.asarray(Q_GOAL, x.dtype)
    return 200.0 * jnp.dot(qd, qd) + 700.0 * jnp.dot(dq, dq)


def constraints(x, u, t, theta: Theta):
    """Integrator residual + joint-limit complementarity, 6 rows
    (reference: experiments/models/acrobot.jl implicit_contact_dynamics_slack)."""
    q_prev, q = x[:NQ], x[NQ:]
    tau = u[0]
    q_next = u[1:3]
    lam = u[3:5]
    s = u[5:7]
    sc = u[7:9]
    return jnp.concatenate([
        integrator_residual(theta, q_prev, q, q_next, tau, lam),
        s - joint_limit_gap(q_next),
        lam * s - sc,
    ])


def problem() -> Problem:
    return Problem(T=T, nx=NX, nu=NU, nc=NC, dynamics=dynamics,
                   contact=True,
                   stage_cost=stage_cost, terminal_cost=terminal_cost,
                   constraints=constraints)


def bounds(dtype=jnp.float64) -> Bounds:
    lo = jnp.concatenate([
        jnp.array([-TORQUE_LIMIT], dtype),
        jnp.full((NQ,), -jnp.inf, dtype),
        jnp.zeros((3 * NCONTACT,), dtype)])
    hi = jnp.concatenate([
        jnp.array([TORQUE_LIMIT], dtype),
        jnp.full((NU - NTAU,), jnp.inf, dtype)])
    return uniform_bounds(T, lo, hi)


def initial_state(dtype=jnp.float64):
    return jnp.zeros((NX,), dtype)


def initial_controls(dtype=jnp.float64):
    u0 = jnp.concatenate([jnp.zeros((NTAU + NQ,), dtype),
                          jnp.full((3 * NCONTACT,), 0.01, dtype)])
    return jnp.broadcast_to(u0, (T, NU))


def random_instance(key, dtype=jnp.float64):
    """(reference: experiments/ipddp2/acrobot_contact.jl:39-48)"""
    ks = jax.random.split(key, 4)
    r = lambda k: 0.9 + 0.2 * jax.random.uniform(k, dtype=dtype)
    return Theta(m1=r(ks[0]), l1=r(ks[1]), m2=r(ks[2]), l2=r(ks[3]))


# Reference seed-1 parameters (reference:
# experiments/ipddp2/params/acrobot_contact.txt line 1:
# m1 I1 l1 lc1 m2 I2 l2 lc2).
SEED1_THETA = dict(m1=0.9146732708938586, l1=0.9698482979114372,
                   m2=1.0397653367382937, l2=1.0256529480685004)
SEED1_GOLDEN_OBJECTIVE = 1.33119481e00
SEED1_GOLDEN_ITERATIONS = 157


def seed1_instance(dtype=jnp.float64):
    return Theta(**{k: jnp.asarray(v, dtype)
                    for k, v in SEED1_THETA.items()})
