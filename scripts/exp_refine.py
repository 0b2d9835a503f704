import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np
from functools import partial
from ipddp2tpu import Options
from ipddp2tpu.backward import _run_pass
from ipddp2tpu.derivatives import evaluate_derivatives, relax_constraints
from ipddp2tpu.models import cartpole as m
from ipddp2tpu.ops.ldlt import ldlt_factor, ldlt_solve
from ipddp2tpu.solve import initialize

prob, bounds, theta = m.problem(), m.bounds(), m.seed1_instance()
opts = Options(optimality_tolerance=1e-7, inertia_method="ldl")
s = initialize(prob, theta, bounds, m.initial_state(), m.initial_controls(), opts)
deriv = evaluate_derivatives(prob, theta, s.x, s.u, s.phi)
c_rel = relax_constraints(prob, s.c_raw, s.mu)
nominal = (c_rel, s.il, s.iu, s.phi, s.zl, s.zu)
*_, (K, rhs, X, ok, n_pos, sok) = _run_pass(
    prob, deriv, nominal, s.mu, jnp.zeros(()), jnp.zeros(()), opts,
    collect_kkt=True)

from functools import partial as _p
@_p(jax.jit, static_argnums=2)
def resid_after(K, rhs, steps):
    def one(Kt, bt):
        f = ldlt_factor(Kt)
        x = ldlt_solve(f, bt)
        for _ in range(steps):
            x = x + ldlt_solve(f, bt - Kt @ x)
        r = jnp.linalg.norm(Kt @ x - bt) / (
            jnp.linalg.norm(Kt) * jnp.linalg.norm(x) + jnp.linalg.norm(bt))
        return r
    return jax.vmap(one)(K, rhs)

for steps in [0, 1, 2, 3]:
    r = np.asarray(resid_after(K, rhs, steps))
    print(f"steps={steps}: max_rel_resid={r.max():.2e} "
          f"n_above_1e-8={int((r > 1e-8).sum())} n_above_1e-10={int((r > 1e-10).sum())}")
