"""df64 jaxpr interpretation (ops/ddeval.py): every benchmark model's
dynamics/constraints/costs must evaluate in double-single to ~1e-14 of the
f64 reference — the mechanism that lets the forward megakernel run USER
model functions inside a Pallas TPU kernel at f64-equivalent precision."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ipddp2tpu.models import (acrobot, cartpole, cartpole_swingup, concar,
                              double_integrator, pushing, quadrotor)
from ipddp2tpu.ops import df64 as dd
from ipddp2tpu.ops.ddeval import dd_eval

B = 8


def _dfify(x):
    return dd.from_f64(jnp.asarray(x))


def _check(fn, args_f64, args_dd, in_axes, tol=1e-11):
    vf = jax.vmap(fn, in_axes=in_axes, out_axes=-1)
    ref = vf(*args_f64)
    out = dd_eval(vf, *args_dd)
    got = jax.tree.map(dd.to_f64, out,
                       is_leaf=lambda v: isinstance(v, dd.DF))
    err = jax.tree.map(
        lambda g, r: float(jnp.max(jnp.abs(g - r)
                                   / jnp.maximum(jnp.abs(r), 1.0))),
        got, ref)
    m = max(jax.tree.leaves(err))
    assert m < tol, m


@pytest.mark.parametrize("mod", [concar, double_integrator, cartpole,
                                 acrobot, pushing, quadrotor,
                                 cartpole_swingup],
                         ids=lambda m: m.__name__.rsplit(".", 1)[-1])
def test_model_functions_in_df64(mod):
    # quadrotor regression: its dynamics uses jnp.cross, which recent jax
    # traces as a nested `jit` call primitive — the interpreter must
    # recurse into call primitives (ops/ddeval.py _call_rule)
    rng = np.random.default_rng(1)
    probe = (None if mod is double_integrator
             else mod.random_instance(jax.random.PRNGKey(0)))
    if probe is None or (not hasattr(probe, "_fields")
                         and not isinstance(probe, tuple)):
        # no randomized theta: double_integrator has no random_instance
        # input, and models like cartpole_swingup return only a randomized
        # initial state (a bare array — NOT a theta; indexing it would
        # silently pick the scalar cart position)
        th, th_l, axth = None, None, None
    else:
        # concar returns (theta, f_lim, tau_lim, x1); the contact models
        # return their Theta NamedTuple directly (which is also a tuple)
        pick = ((lambda k: mod.random_instance(k))
                if hasattr(probe, "_fields")
                else (lambda k: mod.random_instance(k)[0]))
        th = jax.vmap(pick)(jax.random.split(jax.random.PRNGKey(0), B))
        th_l = jax.tree.map(lambda a: jnp.moveaxis(a, 0, -1), th)
        axth = jax.tree.map(lambda a: -1, th)
    x = jnp.asarray(rng.normal(size=(mod.NX, B)) * 0.3)
    u = jnp.asarray(rng.uniform(0.1, 0.6, size=(mod.NU, B)))
    t = jnp.int32(2)
    th_dd = None if th_l is None else jax.tree.map(_dfify, th_l)
    for fname in ("dynamics", "constraints", "stage_cost"):
        fn = getattr(mod, fname, None)
        if fn is None:          # bound-only models have no constraints
            continue
        _check(fn, (x, u, t, th_l), (_dfify(x), _dfify(u), t, th_dd),
               (-1, -1, None, axth))
    _check(mod.terminal_cost, (x, th_l), (_dfify(x), th_dd), (-1, axth))


def test_full_precision_constants():
    """Python float literals inside model functions must reach the jaxpr at
    f64 and split into exact DF constants — an f32-rounded goal constant
    would shift optima by ~1e-7."""

    def f(x):
        return x * 0.1234567890123456789 + jnp.pi

    x = jnp.asarray(np.linspace(0.5, 2.0, 16))
    got = dd.to_f64(dd_eval(f, _dfify(x)))
    ref = np.asarray(x) * 0.1234567890123456789 + np.pi
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-14)


def test_unsupported_primitive_raises():
    def f(x):
        return jnp.fft.fft(x).real

    with pytest.raises(NotImplementedError, match="no df64 rule"):
        dd_eval(f, _dfify(jnp.ones((8,))))
