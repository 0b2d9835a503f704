"""Test harness configuration.

Tests run on CPU with 8 virtual XLA devices (the multi-chip analog of a fake
backend: SURVEY.md §4) and float64 enabled — the reference solves to KKT
tolerance 1e-7 in Float64, which f32 cannot reach.

Note: this environment registers a TPU PJRT plugin at interpreter start and
pins JAX_PLATFORMS, so the platform must be overridden through jax.config
*after* import, and XLA_FLAGS before first backend use.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

