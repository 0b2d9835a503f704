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



import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Free compiled XLA executables after each test module.

    A long-lived worker accumulates XLA:CPU JIT executable memory until a
    late large compile (8-device shard_map programs, solver while_loops)
    segfaults the process — the round-2/3 "worker crash" mode that xdist
    can only paper over by restarting the worker (the in-flight test still
    reports FAILED). Dropping the jit caches between modules bounds the
    accumulation; cross-module cache reuse is negligible."""
    yield
    jax.clear_caches()
