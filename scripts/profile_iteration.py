"""Wall-time breakdown of one solver iteration's pieces (CPU, for planning).

Times each jitted piece separately on the concar seed-1 iterate: derivative
bundle, Hessian contraction, costate scan, backward (seq + parallel),
rollout, full forward pass.
"""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np
from ipddp2tpu import Options
from ipddp2tpu.backward import backward_pass, costate_scan
from ipddp2tpu.derivatives import (contract_dynamics_hessian,
                                   evaluate_derivatives, relax_constraints)
from ipddp2tpu.forward import forward_pass, rollout
from ipddp2tpu.models import concar
from ipddp2tpu.parallel.priccati import backward_pass_parallel
from ipddp2tpu.solve import _nominal_trial, initialize

options = Options(optimality_tolerance=1e-7)
prob = concar.problem()
theta, f_lim, tau_lim, x1 = concar.seed1_instance()
bounds = concar.bounds(f_lim, tau_lim)
s = initialize(prob, theta, bounds, x1, concar.initial_controls(), options)

def timeit(name, fn, *args, n=20):
    out = fn(*args); jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:28s} {(time.time()-t0)/n*1000:8.2f} ms")
    return out

deriv = timeit("derivatives", jax.jit(lambda x, u, p: evaluate_derivatives(
    prob, theta, x, u, p)), s.x, s.u, s.phi)
lam = timeit("costate scan", jax.jit(lambda d, p: costate_scan(d, p)),
             deriv, s.phi)
second = timeit("hessian contraction", jax.jit(
    lambda x, u, l: contract_dynamics_hessian(prob, theta, x, u, l)),
    s.x, s.u, lam[1:])
second = second + deriv.cH_phi
c_rel = relax_constraints(prob, s.c_raw, s.mu)
nominal = (c_rel, s.il, s.iu, s.phi, s.zl, s.zu)
bw = timeit("backward (sequential)", jax.jit(
    lambda d, n, m, r: backward_pass(prob, d, n, m, r, options,
                                     lam=lam, second=second)),
    deriv, nominal, s.mu, s.reg_last)
timeit("backward (parallel)", jax.jit(
    lambda d, n, m, r: backward_pass_parallel(prob, d, n, m, r, options,
                                              lam=lam, second=second)),
    deriv, nominal, s.mu, s.reg_last)
timeit("rollout (one trial)", jax.jit(
    lambda g: rollout(prob, theta, bounds, g, s.x, s.u, s.phi, s.zl, s.zu,
                      jnp.asarray(1.0))), bw.gains)
timeit("forward pass (full LS)", jax.jit(
    lambda g, dL: forward_pass(prob, theta, bounds, g, _nominal_trial(s),
                               dL, s.mu, s.theta_curr, s.L_curr,
                               s.min_primal_1, s.filter_pts, options)),
    bw.gains, bw.dL)
