"""Benchmark problem definitions (the reference's experiments/ layer,
re-expressed as parameterized JAX problems: SURVEY.md §2.2)."""

from . import (acrobot, cartpole, cartpole_swingup, concar, concar_quad,
               double_integrator, pushing, quadrotor)

__all__ = ["acrobot", "cartpole", "cartpole_swingup", "concar",
           "concar_quad", "double_integrator", "pushing", "quadrotor"]
