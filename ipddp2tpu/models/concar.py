"""Constrained car: obstacle avoidance with slack-encoded inequalities.

The headline paper benchmark (reference: experiments/ipddp2/concar.jl):
a unicycle-like car (RK2-integrated) must reach a goal while avoiding four
circular obstacles. Each obstacle's clearance inequality is encoded with a
pair of nonnegative slacks s-, s+ and a stagewise equality

    (r_obs + r_car)^2 - |xy - xy_obs|^2 - s-_i + s+_i = 0

with an L1 penalty 50 * sum(s-) on the violation slacks
(reference: experiments/ipddp2/concar.jl:71-99).

    x = [px, py, heading, speed]               nx = 4
    u = [accel, steer, s-_1..4, s+_1..4]       nu = 10
    nc = 4 equality rows, N = 101, dt = 0.05

Instance parameters theta (randomized per seed in the reference,
experiments/ipddp2/concar.jl:31-47): control limits (F_lim, tau_lim) and the
four obstacles [x, y, r]. Batching over theta replaces the reference's serial
seed loop.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..problem import Bounds, Problem

NX, NU, NC = 4, 10, 4
NUM_OBSTACLES = 4
NUM_CONTROL = 2       # physical controls; the rest are slacks
DT = 0.05
T = 100               # reference horizon N = 101
R_CAR = 0.02
X_GOAL = (1.0, 1.0, jnp.pi / 4, 0.0)


class Theta(NamedTuple):
    obstacles: jax.Array    # [4, 3] rows (x, y, r)


def _g(x, u):
    """Continuous-time unicycle dynamics (reference: experiments/ipddp2/concar.jl:55-57)."""
    return jnp.array([x[3] * jnp.cos(x[2]), x[3] * jnp.sin(x[2]), u[1], u[0]])


def dynamics(x, u, t, theta):
    """RK2 / explicit midpoint (reference: experiments/ipddp2/concar.jl:59-63)."""
    k1 = _g(x, u)
    k2 = _g(x + DT * 0.5 * k1, u)
    return x + DT * k2


def stage_cost(x, u, t, theta):
    s_minus = u[NUM_CONTROL:NUM_CONTROL + NUM_OBSTACLES]
    effort = DT * (5.0 * u[0] ** 2 + 1.0 * u[1] ** 2)
    return effort + 50.0 * jnp.sum(s_minus)


def terminal_cost(x, theta):
    d = x - jnp.asarray(X_GOAL, x.dtype)
    return 200.0 * jnp.dot(d, d)


def constraints(x, u, t, theta: Theta):
    obs = theta.obstacles
    d2 = jnp.sum((x[:2][None, :] - obs[:, :2]) ** 2, axis=1)   # [4]
    s_minus = u[NUM_CONTROL:NUM_CONTROL + NUM_OBSTACLES]
    s_plus = u[NUM_CONTROL + NUM_OBSTACLES:]
    return (obs[:, 2] + R_CAR) ** 2 - d2 - s_minus + s_plus


def problem() -> Problem:
    return Problem(T=T, nx=NX, nu=NU, nc=NC, dynamics=dynamics,
                   stage_cost=stage_cost, terminal_cost=terminal_cost,
                   constraints=constraints)


def bounds(f_lim, tau_lim, dtype=jnp.float64) -> Bounds:
    """Control limits + nonnegative slacks; broadcastable over batched limits
    (reference: experiments/ipddp2/concar.jl:104-111)."""
    f_lim = jnp.asarray(f_lim, dtype)
    tau_lim = jnp.asarray(tau_lim, dtype)
    zeros = jnp.zeros(f_lim.shape + (2 * NUM_OBSTACLES,), dtype)
    infs = jnp.full(f_lim.shape + (2 * NUM_OBSTACLES,), jnp.inf, dtype)
    lo = jnp.concatenate(
        [-f_lim[..., None], -tau_lim[..., None], zeros], axis=-1)
    hi = jnp.concatenate(
        [f_lim[..., None], tau_lim[..., None], infs], axis=-1)
    bcast = lambda b: jnp.broadcast_to(
        b[..., None, :], b.shape[:-1] + (T, NU))
    return Bounds(lower=bcast(lo), upper=bcast(hi))


def initial_controls(dtype=jnp.float64):
    u0 = jnp.concatenate([jnp.zeros((2,), dtype),
                          jnp.full((2 * NUM_OBSTACLES,), 1e-2, dtype)])
    return jnp.broadcast_to(u0, (T, NU))


def random_instance(key, dtype=jnp.float64):
    """Random instance distribution matching the reference generator
    (reference: experiments/ipddp2/concar.jl:31-47): not bit-identical RNG,
    but the same parameter ranges."""
    ks = jax.random.split(key, 5)
    f_lim = 1.5 + jax.random.uniform(ks[0], dtype=dtype)
    tau_lim = 3.0 + 2.0 * jax.random.uniform(ks[1], dtype=dtype)
    centers = jnp.array([[0.25, 0.25], [0.75, 0.75],
                         [0.25, 0.75], [0.75, 0.25]], dtype)
    xy = centers + (jax.random.uniform(ks[2], (4, 2), dtype=dtype) - 0.5) * 0.2
    r = 0.05 + jax.random.uniform(ks[3], (4,), dtype=dtype) * 0.15
    theta = Theta(obstacles=jnp.concatenate([xy, r[:, None]], axis=1))
    x1 = jnp.array([0.0, 0.0, jnp.pi / 8, 0.0], dtype)
    x1 = x1.at[2].add(jax.random.uniform(ks[4], dtype=dtype) * jnp.pi / 4)
    return theta, f_lim, tau_lim, x1


# Seed-1 instance parameters of the reference benchmark, for exact golden
# comparison (reference: experiments/ipddp2/params/concar.txt line 1, produced
# by experiments/ipddp2/concar.jl:168-173; golden result
# experiments/ipddp2/results/concar.txt:2 = 99 iterations,
# objective 4.46466505e+00).
SEED1_F_LIM = 1.5733663544692928
SEED1_TAU_LIM = 3.698482979114372
SEED1_OBSTACLES = (
    (0.2897653367382937, 0.2756529480685003, 0.1872393505494247),
    (0.6885616232491751, 0.8040360695771332, 0.16707788955127795),
    (0.28405279166889874, 0.6835424212941854, 0.13566311740135806),
    (0.7405617174566697, 0.21046509438357436, 0.0502025416887084),
)
SEED1_X1 = (0.0, 0.0, 0.5464318017788816, 0.0)
SEED1_GOLDEN_OBJECTIVE = 4.46466505e00
SEED1_GOLDEN_ITERATIONS = 99


def seed1_instance(dtype=jnp.float64):
    theta = Theta(obstacles=jnp.asarray(SEED1_OBSTACLES, dtype))
    x1 = jnp.asarray(SEED1_X1, dtype)
    return theta, SEED1_F_LIM, SEED1_TAU_LIM, x1
