"""Post-mortem of the cartpole stall: run to the stall, then dissect the
dual-stationarity residual and the fraction-to-boundary limiter."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from ipddp2tpu import Options
from ipddp2tpu.backward import backward_pass
from ipddp2tpu.derivatives import evaluate_derivatives, relax_constraints
from ipddp2tpu.forward import rollout
from ipddp2tpu.models import cartpole as m
from ipddp2tpu.solve import _nominal_trial, initialize
from scripts.debug_solve import debug_run

options = Options(optimality_tolerance=1e-7, inertia_method="eigh",
                  max_iterations=55)
theta = m.seed1_instance()
prob, bounds = m.problem(), m.bounds()
s = debug_run(prob, bounds, m.initial_state(), m.initial_controls(),
              theta=theta, options=options, max_print=0)
print("=== stalled state: k=", int(s.k), "mu=", float(s.mu))

deriv = evaluate_derivatives(prob, theta, s.x, s.u, s.phi)
c_rel = relax_constraints(prob, s.c_raw, s.mu)
bw = backward_pass(prob, deriv, (c_rel, s.il, s.iu, s.phi, s.zl, s.zu),
                   s.mu, s.reg_last, options)
print("bw status", int(bw.status), "reg", float(bw.reg),
      "dL", float(bw.dL))

# raw dual stationarity per stage
r = (deriv.lu + jnp.einsum("tcu,tc->tu", deriv.cu, s.phi)
     - s.zl + s.zu + jnp.einsum("txu,tx->tu", deriv.fu, bw.lam[1:]))
r = np.asarray(r)
t_bad, i_bad = np.unravel_index(np.argmax(np.abs(r)), r.shape)
print("max |r_u| =", np.abs(r).max(), "at stage", t_bad, "component", i_bad)
print("per-component max over t:", np.abs(r).max(axis=0))

# which variables limit the step at each gamma
tau = max(options.tau_min, 1.0 - float(s.mu))
nom = _nominal_trial(s)
for gamma in [1.0, 0.5, 0.25, 0.125]:
    trial = rollout(prob, theta, bounds, bw.gains, s.x, s.u, s.phi,
                    s.zl, s.zu, jnp.asarray(gamma, jnp.float64))
    sfrac = 1.0 - tau
    viol = {}
    for name, nomv, cur in [("il", s.il, trial.il), ("iu", s.iu, trial.iu),
                            ("zl", s.zl, trial.zl), ("zu", s.zu, trial.zu)]:
        bad = np.asarray(sfrac * nomv > cur)
        if bad.any():
            tt, ii = np.unravel_index(
                np.argmax(np.asarray(sfrac * nomv - cur)), bad.shape)
            viol[name] = (int(bad.sum()), int(tt), int(ii),
                          float(np.asarray(nomv)[tt, ii]),
                          float(np.asarray(cur)[tt, ii]))
    finite = bool(jnp.all(jnp.isfinite(trial.u))
                  & jnp.all(jnp.isfinite(trial.x)))
    print(f"gamma={gamma}: finite={finite} violations={viol}")

# per-stage residual profile
per_stage = np.abs(r).max(axis=1)
print("per-stage max |r_u| (last 10):", per_stage[-10:])
print("per-stage max |r_u| (first 5):", per_stage[:5])
print("argmax stages:", np.argsort(per_stage)[-5:])

# what does the backward pass think the residual is at stage 99?
# reconstruct Qu_hat at stage 99: Vx_next = terminal gradient
Qu99 = (deriv.lu[99] + deriv.cu[99].T @ s.phi[99] + deriv.fu[99].T @ deriv.lTx
        - s.mu / s.il[99] + s.mu / s.iu[99])
print("Qu_hat[99] vs r_u[99]:")
print("  Qu99:", np.asarray(Qu99)[[3, 6, 11, 12, 13, 14]])
print("  r99: ", r[99][[3, 6, 11, 12, 13, 14]])
print("  zl-mu/il at 99:", np.asarray(s.zl[99] - s.mu/s.il[99])[[3, 6, 11, 12, 13, 14]])

# inspect stage-99 KKT conditioning and gains
import jax.numpy as jnp2
nu, nc = prob.nu, prob.nc
t99 = 99
sl = 1.0 / s.il[t99]; su = 1.0 / s.iu[t99]
sig = s.zl[t99] * sl + s.zu[t99] * su
fuV = deriv.fu[t99].T @ deriv.lTxx
H99 = deriv.luu[t99] + jnp2.diag(sig) + fuV @ deriv.fu[t99]
cH = deriv.cH_phi[t99]
H99 = H99 + cH[prob.nx:, prob.nx:]
K99 = jnp2.zeros((nu + nc, nu + nc))
K99 = K99.at[:nu, :nu].set(H99)
K99 = K99.at[:nu, nu:].set(deriv.cu[t99].T)
K99 = K99.at[nu:, :nu].set(deriv.cu[t99])
w = np.linalg.eigvalsh(np.asarray(K99))
print("K99 eigs: min|w|=", np.abs(w).min(), " npos=", (w > 1e-12).sum(),
      "of nu=", nu, " max|w|=", np.abs(w).max())
print("alpha[99] max |.|:", np.abs(np.asarray(bw.gains.alpha[99])).max())
print("psi[99]:", np.asarray(bw.gains.psi[99]))
print("chi_l[99] max:", np.abs(np.asarray(bw.gains.chi_l[99])).max())
print("phi[99]:", np.asarray(s.phi[99]))
print("s.il[99] min:", np.asarray(s.il[99]).min(), "zl[99] max:", np.asarray(s.zl[99]).max())
