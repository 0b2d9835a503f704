"""Trajectory animations (the reference's media/*.mp4 MeshCat analogs,
reference: experiments/visualise/visualise_cartpole.jl, visualise_acrobot.jl,
visualise/concar.jl). GIFs via matplotlib + pillow (no ffmpeg in the image).

Usage:
    python experiments/animate.py [cartpole|acrobot|concar ...]

Writes experiments/plots/<problem>.gif.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np
from matplotlib.animation import FuncAnimation, PillowWriter

from ipddp2tpu import Options, solve

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plots")
os.makedirs(OUT, exist_ok=True)
OPTS = Options(optimality_tolerance=1e-7)


def _save(fig, update, frames, name, fps=25):
    anim = FuncAnimation(fig, update, frames=frames, blit=True)
    path = os.path.join(OUT, f"{name}.gif")
    anim.save(path, writer=PillowWriter(fps=fps))
    plt.close(fig)
    print("wrote", path)


def animate_cartpole():
    """Cart + pole swing-up under joint friction (reference:
    experiments/visualise/visualise_cartpole.jl)."""
    from ipddp2tpu.models import cartpole as m

    sol = solve(m.problem(), m.bounds(), m.initial_state(),
                m.initial_controls(), theta=m.seed1_instance(), options=OPTS)
    q = np.asarray(sol.x)[:, 2:4]           # next-config convention
    theta = m.seed1_instance()
    length = float(theta.l)

    fig, ax = plt.subplots(figsize=(6, 4))
    ax.set_xlim(-2.0, 2.0)
    ax.set_ylim(-0.8, 0.8)
    ax.set_aspect("equal")
    ax.axhline(0, color="gray", lw=0.5)
    cart, = ax.plot([], [], "s", ms=18, color="tab:blue")
    pole, = ax.plot([], [], "-o", lw=2, color="tab:orange")

    def update(i):
        x, th = q[i]
        px, py = x + length * np.sin(th), -length * np.cos(th)
        cart.set_data([x], [0.0])
        pole.set_data([x, px], [0.0, py])
        return cart, pole

    _save(fig, update, len(q), "cartpole_friction_seed1")


def animate_acrobot():
    """Double pendulum with elbow joint-limit contact (reference:
    experiments/visualise/visualise_acrobot.jl)."""
    from ipddp2tpu.models import acrobot as m

    theta = m.seed1_instance()
    sol = solve(m.problem(), m.bounds(), m.initial_state(),
                m.initial_controls(), theta=theta, options=OPTS)
    q = np.asarray(sol.x)[:, 2:4]
    l1, l2 = float(theta.l1), float(theta.l2)

    fig, ax = plt.subplots(figsize=(5, 5))
    lim = l1 + l2 + 0.2
    ax.set_xlim(-lim, lim)
    ax.set_ylim(-lim, lim)
    ax.set_aspect("equal")
    links, = ax.plot([], [], "-o", lw=3, color="tab:blue")

    def update(i):
        a, b = q[i]
        x1, y1 = l1 * np.sin(a), -l1 * np.cos(a)
        x2 = x1 + l2 * np.sin(a + b)
        y2 = y1 - l2 * np.cos(a + b)
        links.set_data([0, x1, x2], [0, y1, y2])
        return (links,)

    _save(fig, update, len(q), "acrobot_contact_seed1")


def animate_concar():
    """Car weaving through the obstacle field (reference:
    experiments/visualise/concar.jl)."""
    from ipddp2tpu.models import concar as m

    theta, f_lim, tau_lim, x1 = m.seed1_instance()
    sol = solve(m.problem(), m.bounds(f_lim, tau_lim), x1,
                m.initial_controls(), theta=theta, options=OPTS)
    x = np.asarray(sol.x)

    fig, ax = plt.subplots(figsize=(5, 5))
    for ox, oy, r in np.asarray(theta.obstacles):
        ax.add_patch(plt.Circle((ox, oy), r, color="tab:red", alpha=0.4))
    ax.plot(*m.X_GOAL[:2], "*", ms=15, color="gold")
    ax.set_xlim(-0.1, 1.1)
    ax.set_ylim(-0.1, 1.1)
    ax.set_aspect("equal")
    trail, = ax.plot([], [], "-", lw=1, color="tab:blue")
    car, = ax.plot([], [], "o", ms=8, color="tab:blue")
    nose, = ax.plot([], [], "-", lw=2, color="tab:blue")

    def update(i):
        trail.set_data(x[:i + 1, 0], x[:i + 1, 1])
        car.set_data([x[i, 0]], [x[i, 1]])
        nose.set_data([x[i, 0], x[i, 0] + 0.04 * np.cos(x[i, 2])],
                      [x[i, 1], x[i, 1] + 0.04 * np.sin(x[i, 2])])
        return trail, car, nose

    _save(fig, update, len(x), "concar_seed1")


if __name__ == "__main__":
    which = sys.argv[1:] or ["cartpole", "acrobot", "concar"]
    for name in which:
        {"cartpole": animate_cartpole, "acrobot": animate_acrobot,
         "concar": animate_concar}[name]()
