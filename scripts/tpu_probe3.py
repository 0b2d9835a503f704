import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))
import jax
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
from ipddp2tpu import Options
from ipddp2tpu.backward import _run_pass
from ipddp2tpu.derivatives import evaluate_derivatives, relax_constraints
from ipddp2tpu.models import concar
from ipddp2tpu.solve import initialize

unroll = sys.argv[1] == "unroll"
options = Options(optimality_tolerance=1e-7, ldlt_unroll=unroll)
problem = concar.problem()
theta, f_lim, tau_lim, x1 = concar.seed1_instance()
bounds = concar.bounds(f_lim, tau_lim)
s = initialize(problem, theta, bounds, x1, concar.initial_controls(), options)
deriv = evaluate_derivatives(problem, theta, s.x, s.u, s.phi)
c_rel = relax_constraints(problem, s.c_raw, s.mu)
nominal = (c_rel, s.il, s.iu, s.phi, s.zl, s.zu)
f = jax.jit(lambda d, n, mu: _run_pass(problem, d, n, mu, jnp.zeros(()),
                                       jnp.zeros(()), options))
t0 = time.time()
out = f(deriv, nominal, s.mu)
jax.block_until_ready(out[2])
print(f"single _run_pass (unroll={unroll}) compile+run:", time.time() - t0,
      "dL", float(out[2]), flush=True)
t0 = time.time()
out = f(deriv, nominal, s.mu); jax.block_until_ready(out[2])
print("run:", time.time() - t0, flush=True)
