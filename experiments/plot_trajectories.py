"""Trajectory visualisation (the reference's L7 layer:
experiments/visualise/concar.jl and the per-problem plot blocks).

Usage:
    python experiments/plot_trajectories.py [concar|cartpole|acrobot|quadrotor]

Writes PNGs to experiments/plots/.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

from ipddp2tpu import Options, solve

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plots")
os.makedirs(OUT, exist_ok=True)
OPTS = Options(optimality_tolerance=1e-7)


def plot_concar():
    """Car trajectory around the obstacles (reference:
    experiments/visualise/concar.jl)."""
    from ipddp2tpu.models import concar

    theta, f_lim, tau_lim, x1 = concar.seed1_instance()
    sol = solve(concar.problem(), concar.bounds(f_lim, tau_lim), x1,
                concar.initial_controls(), theta=theta, options=OPTS)
    fig, ax = plt.subplots(figsize=(6, 6))
    for ox, oy, r in np.asarray(theta.obstacles):
        ax.add_patch(plt.Circle((ox, oy), r, color="tab:red", alpha=0.4))
    x = np.asarray(sol.x)
    ax.plot(x[:, 0], x[:, 1], "-o", ms=2, color="tab:blue")
    ax.plot(*concar.X_GOAL[:2], "*", ms=15, color="gold")
    ax.set_xlim(-0.1, 1.1)
    ax.set_ylim(-0.1, 1.1)
    ax.set_title(f"concar seed 1 — {int(sol.iterations)} iters, "
                 f"J={float(sol.objective):.4f}")
    fig.savefig(os.path.join(OUT, "concar_seed1.png"), dpi=120)
    print("wrote", os.path.join(OUT, "concar_seed1.png"))


def plot_cartpole():
    """Contact-implicit cartpole: configurations + friction impulses
    (reference: experiments/ipddp2/cartpole_friction.jl plot block)."""
    from ipddp2tpu.models import cartpole as m

    sol = solve(m.problem(), m.bounds(), m.initial_state(),
                m.initial_controls(), theta=m.seed1_instance(),
                options=OPTS)
    x = np.asarray(sol.x)
    u = np.asarray(sol.u)
    t = np.arange(m.T) * m.DT
    qdot = (x[:-1, 2:4] - x[:-1, 0:2]) / m.DT
    fig, ax = plt.subplots(figsize=(8, 5))
    ax.plot(t, qdot[:, 0], label="cart velocity")
    ax.plot(t, qdot[:, 1], label="pole velocity")
    ax.plot(t, u[:, 0], label="force", color="tab:green")
    ax.plot(t, u[:, 3] - u[:, 4], "--", label="slider friction impulse")
    ax.plot(t, u[:, 5] - u[:, 6], "--", label="hinge friction impulse")
    ax.legend()
    ax.set_xlabel("t")
    ax.set_title(f"cartpole friction seed 1 — {int(sol.iterations)} iters")
    fig.savefig(os.path.join(OUT, "cartpole_friction_seed1.png"), dpi=120)
    print("wrote", os.path.join(OUT, "cartpole_friction_seed1.png"))


def plot_acrobot():
    """Elbow joint-limit gaps and contact impulses (reference:
    experiments/ipddp2/acrobot_contact.jl plot block)."""
    from ipddp2tpu.models import acrobot as m

    sol = solve(m.problem(), m.bounds(), m.initial_state(),
                m.initial_controls(), theta=m.seed1_instance(),
                options=OPTS)
    u = np.asarray(sol.u)
    x = np.asarray(sol.x)
    t = np.arange(m.T) * m.DT
    fig, ax = plt.subplots(figsize=(8, 5))
    ax.plot(t, 0.5 * np.pi - x[:-1, 3], label="gap upper")
    ax.plot(t, x[:-1, 3] + 0.5 * np.pi, label="gap lower")
    ax.plot(t, u[:, 3], "--", label="lambda 1")
    ax.plot(t, u[:, 4], "--", label="lambda 2")
    ax.set_ylim(0, 5)
    ax.legend()
    ax.set_title(f"acrobot contact seed 1 — {int(sol.iterations)} iters")
    fig.savefig(os.path.join(OUT, "acrobot_contact_seed1.png"), dpi=120)
    print("wrote", os.path.join(OUT, "acrobot_contact_seed1.png"))


def plot_quadrotor():
    from ipddp2tpu.models import quadrotor as m

    sol = solve(m.problem(), m.bounds(), m.initial_state(),
                m.initial_controls(),
                options=Options(optimality_tolerance=1e-6))
    x = np.asarray(sol.x)
    fig = plt.figure(figsize=(6, 6))
    ax = fig.add_subplot(projection="3d")
    ax.plot(x[:, 0], x[:, 1], x[:, 2])
    ax.scatter(*m.GOAL, marker="*", s=120, color="gold")
    ax.set_title(f"quadrotor — {int(sol.iterations)} iters")
    fig.savefig(os.path.join(OUT, "quadrotor.png"), dpi=120)
    print("wrote", os.path.join(OUT, "quadrotor.png"))


def plot_pushing():
    """Slider path around the obstacle + contact-mode signals (the analog of
    the reference's pushing animation, media/*.mp4, and the plot block in
    experiments/ipddp2/pushing_1_obs.jl)."""
    from ipddp2tpu.models import pushing as m

    theta = m.seed1_instance()
    sol = solve(m.problem(), m.bounds(), m.initial_state(),
                m.initial_controls(), theta=theta, options=OPTS)
    x = np.asarray(sol.x)
    u = np.asarray(sol.u)
    obs = np.asarray(theta.obstacle)
    fig, axes = plt.subplots(1, 2, figsize=(11, 5))
    ax = axes[0]
    ax.add_patch(plt.Circle((obs[0], obs[1]), obs[2], color="tab:red",
                            alpha=0.4))
    ax.plot(x[:, 0], x[:, 1], "-o", ms=2, color="tab:blue")
    ax.plot(*m.X_GOAL[:2], "*", ms=15, color="gold")
    ax.set_aspect("equal")
    ax.set_title("slider path")
    ax = axes[1]
    t = np.arange(m.T) * m.DT
    ax.plot(t, u[:, 0], label="normal force")
    ax.plot(t, u[:, 1], label="tangential force")
    ax.plot(t, x[:-1, 3], label="contact angle phi")
    ax.legend()
    ax.set_title("contact signals")
    fig.suptitle(f"pushing_1_obs seed 1 — {int(sol.iterations)} iters, "
                 f"J={float(sol.objective):.5f}")
    fig.savefig(os.path.join(OUT, "pushing_1_obs_seed1.png"), dpi=120)
    print("wrote", os.path.join(OUT, "pushing_1_obs_seed1.png"))


if __name__ == "__main__":
    which = sys.argv[1:] or ["concar", "cartpole", "acrobot", "quadrotor",
                             "pushing"]
    for name in which:
        {"concar": plot_concar, "cartpole": plot_cartpole,
         "acrobot": plot_acrobot, "quadrotor": plot_quadrotor,
         "pushing": plot_pushing}[name]()
