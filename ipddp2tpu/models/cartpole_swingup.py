"""Classic cartpole swing-up with control bounds only (no stagewise
constraints) — BASELINE.json config "Cartpole swing-up, N=100, control bounds
only". Exercises the solver's nc = 0 path: the per-stage KKT system reduces to
the barrier-regularized control Hessian.

    x = [p, theta, pdot, thetadot], u = [force]
    explicit RK2, dt = 0.05, T = 100
"""

from __future__ import annotations

import jax.numpy as jnp

from ..problem import Bounds, Problem, uniform_bounds

NX, NU, NC = 4, 1, 0

# Self-generated regression anchors (no reference counterpart exists for
# this BASELINE.json config): deterministic default-instance solve at tol
# 1e-7, f64, CPU, default options (recorded round 4).
ANCHOR_OBJECTIVE = 0.17506381040839103
ANCHOR_ITERATIONS = 112
DT = 0.05
T = 100
MC, MP, L, GRAVITY = 1.0, 0.2, 0.5, 9.81
FORCE_LIMIT = 10.0


def _accel(x, u):
    th, pdot, thdot = x[1], x[2], x[3]
    s, c = jnp.sin(th), jnp.cos(th)
    f = u[0]
    denom = MC + MP * s ** 2
    pddot = (f + MP * s * (L * thdot ** 2 + GRAVITY * c)) / denom
    thddot = (-f * c - MP * L * thdot ** 2 * c * s
              - (MC + MP) * GRAVITY * s) / (L * denom)
    return jnp.array([pdot, thdot, pddot, thddot])


def dynamics(x, u, t, theta):
    k1 = _accel(x, u)
    k2 = _accel(x + 0.5 * DT * k1, u)
    return x + DT * k2


def stage_cost(x, u, t, theta):
    return DT * (0.01 * u[0] ** 2 + 0.1 * x[0] ** 2)


def terminal_cost(x, theta):
    goal = jnp.array([0.0, jnp.pi, 0.0, 0.0], x.dtype)
    d = x - goal
    return 500.0 * jnp.dot(d, d)


def problem() -> Problem:
    return Problem(T=T, nx=NX, nu=NU, nc=NC, dynamics=dynamics,
                   stage_cost=stage_cost, terminal_cost=terminal_cost)


def bounds(dtype=jnp.float64) -> Bounds:
    return uniform_bounds(T, jnp.array([-FORCE_LIMIT], dtype),
                          jnp.array([FORCE_LIMIT], dtype))


def initial_state(dtype=jnp.float64):
    return jnp.zeros((NX,), dtype)


def initial_controls(dtype=jnp.float64):
    return jnp.full((T, NU), 0.01, dtype)


def random_instance(key, dtype=jnp.float64):
    """Randomized initial state (cart position / pole angle perturbation)
    for instance batching — the campaign analog of the reference's
    randomized-seed experiment protocol."""
    import jax

    k1, k2 = jax.random.split(key)
    x1 = jnp.zeros((NX,), dtype)
    x1 = x1.at[0].set(0.5 * jax.random.uniform(k1, dtype=dtype,
                                               minval=-1.0, maxval=1.0))
    x1 = x1.at[1].set(0.3 * jax.random.uniform(k2, dtype=dtype,
                                               minval=-1.0, maxval=1.0))
    return x1
