"""Quadrotor point-to-point flight with rotor-thrust bounds.

BASELINE.json config "Batched concar/quadrotor: 1k-10k vmapped instances over
initial states per chip": a 12-state quadrotor (position, Euler angles, linear
and angular velocity) flying to hover at a target, four nonnegative,
upper-bounded rotor thrusts. The larger state dimension stresses the stage
GEMMs (nx = 12) rather than the KKT factorization (nu + nc = 4).

    x = [p(3), rpy(3), v(3), w(3)], u = 4 rotor thrusts
    explicit RK2, dt = 0.05, T = 100
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..problem import Bounds, Problem, uniform_bounds

NX, NU, NC = 12, 4, 0

# Self-generated regression anchors (no reference counterpart exists for
# this BASELINE.json config): deterministic default-instance solve at tol
# 1e-7, f64, CPU, default options (recorded round 4).
ANCHOR_OBJECTIVE = 0.0029196425180430595
ANCHOR_ITERATIONS = 24
DT = 0.05
T = 100
MASS, GRAVITY, ARM = 1.0, 9.81, 0.2
INERTIA = (0.01, 0.01, 0.02)
KAPPA_YAW = 0.05            # rotor drag-torque / thrust ratio
THRUST_MAX = 2.0 * MASS * GRAVITY / NU * 2.0
GOAL = (1.0, 1.0, 1.0)


class Theta(NamedTuple):
    goal: jax.Array       # [3] target position


def _rates(x, u):
    rpy = x[3:6]
    v = x[6:9]
    w = x[9:12]
    phi, th, psi = rpy
    cph, sph = jnp.cos(phi), jnp.sin(phi)
    cth, sth = jnp.cos(th), jnp.sin(th)
    cps, sps = jnp.cos(psi), jnp.sin(psi)

    thrust = jnp.sum(u)
    # body-z axis in world frame (ZYX Euler)
    bz = jnp.array([cph * sth * cps + sph * sps,
                    cph * sth * sps - sph * cps,
                    cph * cth])
    # dtype-pinned: an all-Python-float jnp.array is float64-strong under
    # x64 and would promote the whole f32 rollout (breaks the mixed-
    # precision scan carry)
    acc = thrust / MASS * bz - jnp.array([0.0, 0.0, GRAVITY], x.dtype)

    # torques from rotor layout (+ configuration)
    tau = jnp.array([
        ARM * (u[1] - u[3]),
        ARM * (u[2] - u[0]),
        KAPPA_YAW * (u[0] - u[1] + u[2] - u[3]),
    ])
    I = jnp.asarray(INERTIA, x.dtype)
    wdot = (tau - jnp.cross(w, I * w)) / I

    # Euler-angle kinematics (ZYX)
    tth = jnp.tan(th)
    E = jnp.array([[1.0, sph * tth, cph * tth],
                   [0.0, cph, -sph],
                   [0.0, sph / cth, cph / cth]])
    rpy_dot = E @ w
    return jnp.concatenate([v, rpy_dot, acc, wdot])


def dynamics(x, u, t, theta):
    k1 = _rates(x, u)
    k2 = _rates(x + 0.5 * DT * k1, u)
    return x + DT * k2


def stage_cost(x, u, t, theta):
    hover = MASS * GRAVITY / NU
    du = u - hover
    return DT * (0.1 * jnp.dot(du, du) + 0.1 * jnp.dot(x[9:12], x[9:12]))


def terminal_cost(x, theta: Theta):
    goal = theta.goal if theta is not None else jnp.asarray(GOAL, x.dtype)
    dp = x[:3] - goal
    return (200.0 * jnp.dot(dp, dp) + 50.0 * jnp.dot(x[6:9], x[6:9])
            + 50.0 * jnp.dot(x[3:6], x[3:6]) + 50.0 * jnp.dot(x[9:12], x[9:12]))


def problem() -> Problem:
    return Problem(T=T, nx=NX, nu=NU, nc=NC, dynamics=dynamics,
                   stage_cost=stage_cost, terminal_cost=terminal_cost)


def bounds(dtype=jnp.float64) -> Bounds:
    return uniform_bounds(T, jnp.zeros((NU,), dtype),
                          jnp.full((NU,), THRUST_MAX, dtype))


def initial_state(dtype=jnp.float64):
    return jnp.zeros((NX,), dtype)


def initial_controls(dtype=jnp.float64):
    return jnp.full((T, NU), MASS * GRAVITY / NU, dtype)


def random_instance(key, dtype=jnp.float64):
    """Randomized goal + initial position for instance batching."""
    k1, k2 = jax.random.split(key)
    goal = jnp.asarray(GOAL, dtype) + 0.5 * jax.random.uniform(
        k1, (3,), dtype=dtype, minval=-1.0, maxval=1.0)
    x1 = initial_state(dtype).at[:3].set(
        0.2 * jax.random.uniform(k2, (3,), dtype=dtype, minval=-1.0,
                                 maxval=1.0))
    return Theta(goal=goal), x1
