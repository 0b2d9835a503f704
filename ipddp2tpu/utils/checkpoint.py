"""Checkpoint / resume.

The reference has no checkpointing (SURVEY.md §5); here the entire solver
state is one pytree, so checkpointing is a flat save/load. `run()` resumes
from any saved state, which doubles as the warm-start API: seed a new solve
with a previous solve's (x, u, phi, zl, zu, mu).
"""

from __future__ import annotations

import numpy as np


def save_state(path: str, state) -> None:
    np.savez(path, **{f: np.asarray(getattr(state, f))
                      for f in state._fields})


def load_state(path: str):
    import jax.numpy as jnp

    from ..solve import SolverState  # deferred: avoids a circular import

    with np.load(path) as data:
        return SolverState(**{f: jnp.asarray(data[f])
                              for f in SolverState._fields})
