import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np
from ipddp2tpu import Options
from ipddp2tpu.backward import _run_pass
from ipddp2tpu.derivatives import evaluate_derivatives, relax_constraints
from ipddp2tpu.models import cartpole as m
from ipddp2tpu.solve import initialize

prob, bounds, theta = m.problem(), m.bounds(), m.seed1_instance()

def run(method):
    opts = Options(optimality_tolerance=1e-7, inertia_method=method)
    s = initialize(prob, theta, bounds, m.initial_state(),
                   m.initial_controls(), opts)
    deriv = evaluate_derivatives(prob, theta, s.x, s.u, s.phi)
    c_rel = relax_constraints(prob, s.c_raw, s.mu)
    nominal = (c_rel, s.il, s.iu, s.phi, s.zl, s.zu)
    *_, dbg = _run_pass(prob, deriv, nominal, s.mu, jnp.zeros(()),
                        jnp.zeros(()), opts, collect_kkt=True)
    return dbg

Ke, re_, Xe, *_ = run("eigh")
Kl, rl, Xl, okl, npl, sokl = run("ldl")
Ke, Kl, Xe, Xl = map(np.asarray, (Ke, Kl, Xe, Xl))
for t in range(99, -1, -1):
    dK = np.abs(Ke[t] - Kl[t]).max() / max(1.0, np.abs(Ke[t]).max())
    dX = np.abs(Xe[t] - Xl[t]).max() / max(1.0, np.abs(Xe[t]).max())
    if dK > 1e-10 or dX > 1e-8 or t > 94 or t < 12:
        print(f"t={t:3d} dK={dK:.1e} dX={dX:.1e} |K|={np.abs(Kl[t]).max():.1e} "
              f"sok={bool(sokl[t])}")
