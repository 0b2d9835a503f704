"""Every model must be dtype-polymorphic: f32 in => f32 out.

The mixed-precision pipeline casts (bounds, x1, u0, theta) to float32 and
runs the SAME model callables for the bulk phase (mixed.py); an
f64-strong constant inside a model (an all-Python-float `jnp.array` is
float64 under x64) silently promotes the rollout — or breaks the
`initialize` scan carry outright (observed on quadrotor, round 4). The
reference is Float64-only (reference: src/solver.jl) so this invariant is
ours to hold.
"""

import jax
import jax.numpy as jnp
import pytest

from ipddp2tpu.models import (acrobot, cartpole, cartpole_swingup, concar,
                              concar_quad, double_integrator, pushing,
                              quadrotor)

MODELS = [acrobot, cartpole, cartpole_swingup, concar, concar_quad,
          double_integrator, pushing, quadrotor]


def _f32_instance(mod):
    """(problem, bounds, theta|None, x1, u0) cast to float32."""
    p = mod.problem()
    theta, bounds = None, None
    if mod in (concar, concar_quad):
        # random_instance returns (theta, f_lim, tau_lim, x1); bounds are
        # per-instance
        theta, f_lim, tau_lim, x1 = mod.random_instance(
            jax.random.PRNGKey(0))
        bounds = mod.bounds(f_lim, tau_lim)
    elif mod is quadrotor:
        theta, x1 = mod.random_instance(jax.random.PRNGKey(0))
        bounds = mod.bounds()
    else:
        if hasattr(mod, "random_instance"):
            probe = mod.random_instance(jax.random.PRNGKey(0))
            # a bare-array return is a randomized initial state (e.g.
            # cartpole_swingup), not a theta
            theta = probe if (hasattr(probe, "_fields")
                              or isinstance(probe, tuple)) else None
        x1 = mod.initial_state()
        bounds = mod.bounds()
    u0 = mod.initial_controls()
    c32 = lambda a: (a.astype(jnp.float32)
                     if jnp.issubdtype(a.dtype, jnp.floating) else a)
    return p, *jax.tree.map(c32, (bounds, theta, x1, u0))


@pytest.mark.parametrize("mod", MODELS,
                         ids=[m.__name__.split(".")[-1] for m in MODELS])
def test_model_callables_preserve_f32(mod):
    p, _, theta, x1, u0 = _f32_instance(mod)
    u = u0[0]
    x_next = p.dynamics(x1, u, 0, theta)
    assert x_next.dtype == jnp.float32, "dynamics promoted f32"
    cost = p.stage_cost(x1, u, 0, theta)
    assert cost.dtype == jnp.float32, "stage cost promoted f32"
    term = p.terminal_cost(x_next, theta)
    assert term.dtype == jnp.float32, "terminal cost promoted f32"
    if p.nc and p.constraints is not None:
        c = p.constraints(x1, u, 0, theta)
        assert c.dtype == jnp.float32, "constraints promoted f32"


@pytest.mark.parametrize("mod", MODELS,
                         ids=[m.__name__.split(".")[-1] for m in MODELS])
def test_initialize_f32_rollout(mod):
    """The mixed pipeline's first step: build the f32 nominal trajectory.

    This is exactly where the quadrotor f64-promotion failed (scan carry
    type error at solve.py `initialize`)."""
    from ipddp2tpu.options import Options
    from ipddp2tpu.solve import initialize

    p, bounds, theta, x1, u0 = _f32_instance(mod)
    state = initialize(p, theta, bounds, x1, u0,
                       Options(optimality_tolerance=1e-4))
    assert state.x.dtype == jnp.float32
    assert state.u.dtype == jnp.float32
