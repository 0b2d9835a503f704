"""Benchmark problem definitions (the reference's experiments/ layer,
re-expressed as parameterized JAX problems: SURVEY.md §2.2)."""

from . import double_integrator, concar

__all__ = ["double_integrator", "concar"]
