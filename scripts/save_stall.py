"""Run cartpole to the line-search failure and cache the state to disk."""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import numpy as np
from ipddp2tpu import Options
from ipddp2tpu.models import cartpole as m
from scripts.debug_solve import debug_run

options = Options(optimality_tolerance=1e-7, inertia_method="eigh",
                  max_iterations=61)
s = debug_run(m.problem(), m.bounds(), m.initial_state(),
              m.initial_controls(), theta=m.seed1_instance(),
              options=options, max_print=0)
np.savez("/tmp/cartpole_stall.npz",
         **{f: np.asarray(getattr(s, f)) for f in s._fields})
print("saved k=", int(s.k), "mu=", float(s.mu))
