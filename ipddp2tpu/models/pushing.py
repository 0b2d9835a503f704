"""Planar pushing with friction cone, sticking/sliding modes and an obstacle.

The reference's pushing_1_obs benchmark (reference:
experiments/ipddp2/pushing_1_obs.jl): a pusher moves a rectangular slider on a
plane using an ellipsoidal limit-surface model; the friction-cone and
mode-complementarity conditions plus an obstacle clearance are stagewise
equalities with slack-encoded inequalities.

    x = [px, py, theta, phi]                          nx = 4
    u = [fn, ft, vphi+, vphi-, g+, g-, sc1, sc2, qphi, so+, so-]   nu = 11
    nc = 6 equality rows, N = 101, dt = 0.04

where fn, ft are normal/tangential pusher forces, vphi+- the contact-point
slide rates, g+- the friction-cone gaps, sc the complementarity slacks, qphi a
bound-encoding copy of the contact angle phi, and so+- the obstacle slacks.

Instance parameters theta: block half-dims (zx, zy), ellipsoid ratio c,
pusher-slider friction mu_fric, obstacle [x, y, r]
(reference: experiments/ipddp2/pushing_1_obs.jl:39-60).

Golden seed-1 anchor: 483 iterations, objective 3.22554840e-02
(reference: experiments/ipddp2/results/pushing_1_obs.txt:2).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..problem import Bounds, Problem, uniform_bounds

NX, NU, NC = 4, 11, 6
DT = 0.04
T = 100
FORCE_LIMIT = 0.3
VEL_LIMIT = 3.0
R_PUSH = 0.01
PHI_LIMIT = 0.9
X_GOAL = (0.3, 0.4, 1.5 * jnp.pi, 0.0)

# the reference's block-parameter table (zx, zy, c)
BLOCK_PARAMS = (
    (0.07, 0.12, 0.03711),
    (0.06, 0.12, 0.0355938),
    (0.08, 0.12, 0.0387237),
    (0.07, 0.13, 0.0393039),
    (0.06, 0.13, 0.0378424),
    (0.08, 0.13, 0.0366212),
    (0.07, 0.11, 0.0349493),
    (0.06, 0.11, 0.0333738),
    (0.08, 0.11, 0.0408633),
)


class Theta(NamedTuple):
    zx: jax.Array          # block x-dimension
    zy: jax.Array          # block y-dimension
    c: jax.Array           # ellipsoidal limit-surface approximation ratio
    mu_fric: jax.Array     # pusher-slider friction coefficient
    obstacle: jax.Array    # [x, y, r]


def dynamics(x, u, t, theta: Theta):
    """Ellipsoidal limit-surface quasi-static model, forward Euler
    (reference: experiments/ipddp2/pushing_1_obs.jl:71-98)."""
    th, phi = x[2], x[3]
    # L .* (Jc(phi)^T [fn, ft]) with L = [1, 1, c^-2]
    scaled = jnp.array([
        u[0],
        u[1],
        theta.zx / 2 * (jnp.tan(phi) * u[0] - u[1]) / theta.c ** 2,
    ])
    cos_t, sin_t = jnp.cos(th), jnp.sin(th)
    rotated = jnp.array([
        cos_t * scaled[0] - sin_t * scaled[1],
        sin_t * scaled[0] + cos_t * scaled[1],
        scaled[2],
    ])
    rates = jnp.concatenate([rotated, jnp.array([u[2] - u[3]])])
    return x + DT * rates


def stage_cost(x, u, t, theta):
    """1e-2 |f|^2 + 2 (sc1 + sc2) + 2 so-
    (reference: experiments/ipddp2/pushing_1_obs.jl:103)."""
    return (1e-2 * (u[0] ** 2 + u[1] ** 2)
            + 2.0 * (u[6] + u[7]) + 2.0 * u[10])


def terminal_cost(x, theta):
    d = x - jnp.asarray(X_GOAL, x.dtype)
    return 20.0 * jnp.dot(d, d)


def constraints(x, u, t, theta: Theta):
    """Friction cone + mode complementarity + phi bound + obstacle
    (reference: experiments/ipddp2/pushing_1_obs.jl:108-122)."""
    r_total = jnp.maximum(theta.zx, theta.zy) + R_PUSH
    xy_diff = x[:2] - theta.obstacle[:2]
    obs = ((theta.obstacle[2] + r_total) ** 2
           - jnp.dot(xy_diff, xy_diff) + u[9] - u[10])
    return jnp.array([
        theta.mu_fric * u[0] - u[1] - u[4],
        theta.mu_fric * u[0] + u[1] - u[5],
        u[4] * u[2] - u[6],
        u[5] * u[3] - u[7],
        x[3] - u[8],
        obs,
    ])


def problem() -> Problem:
    return Problem(T=T, nx=NX, nu=NU, nc=NC, dynamics=dynamics,
                   contact=True,
                   stage_cost=stage_cost, terminal_cost=terminal_cost,
                   constraints=constraints)


def bounds(dtype=jnp.float64) -> Bounds:
    """(reference: experiments/ipddp2/pushing_1_obs.jl:127-129)"""
    lo = jnp.array([0.0, -FORCE_LIMIT, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0,
                    -PHI_LIMIT, 0.0, 0.0], dtype)
    hi = jnp.array([FORCE_LIMIT, FORCE_LIMIT, VEL_LIMIT, VEL_LIMIT,
                    jnp.inf, jnp.inf, jnp.inf, jnp.inf,
                    PHI_LIMIT, jnp.inf, jnp.inf], dtype)
    return uniform_bounds(T, lo, hi)


def initial_state(dtype=jnp.float64):
    return jnp.zeros((NX,), dtype)


def initial_controls(dtype=jnp.float64):
    return jnp.full((T, NU), 0.01, dtype)


def random_instance(key, dtype=jnp.float64):
    """(reference: experiments/ipddp2/pushing_1_obs.jl:39-60)"""
    ks = jax.random.split(key, 3)
    blocks = jnp.asarray(BLOCK_PARAMS, dtype)
    idx = jax.random.randint(ks[0], (), 0, len(BLOCK_PARAMS))
    zx, zy, c = blocks[idx]
    obstacle = (jnp.array([0.2, 0.2, 0.05], dtype)
                + jnp.array([0.3, 0.1, 0.02], dtype)
                * (jax.random.uniform(ks[1], (3,), dtype=dtype) - 0.5))
    mu_fric = 0.2 + 0.1 * (jax.random.uniform(ks[2], dtype=dtype) - 0.5)
    return Theta(zx=zx, zy=zy, c=c, mu_fric=mu_fric, obstacle=obstacle)


# Reference seed-1 parameters (reference:
# experiments/ipddp2/params/pushing_1_obs.txt line 1: zx zy c mu_fric obs).
SEED1_THETA = dict(zx=0.07, zy=0.12, c=0.03711,
                   mu_fric=0.24149290036628315,
                   obstacle=(0.18492414895571863, 0.21988266836914686,
                             0.05256529480685004))
SEED1_GOLDEN_OBJECTIVE = 3.22554840e-02
SEED1_GOLDEN_ITERATIONS = 483


def seed1_instance(dtype=jnp.float64):
    return Theta(zx=jnp.asarray(SEED1_THETA["zx"], dtype),
                 zy=jnp.asarray(SEED1_THETA["zy"], dtype),
                 c=jnp.asarray(SEED1_THETA["c"], dtype),
                 mu_fric=jnp.asarray(SEED1_THETA["mu_fric"], dtype),
                 obstacle=jnp.asarray(SEED1_THETA["obstacle"], dtype))
