"""Profiling helpers smoke test."""

import jax.numpy as jnp

from ipddp2tpu.utils.profiling import BlockTimer


def test_block_timer():
    timer = BlockTimer()
    with timer(jnp.ones((8, 8)) @ jnp.ones((8, 8))):
        pass
    assert timer.seconds >= 0.0
