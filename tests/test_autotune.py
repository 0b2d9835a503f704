"""The measured-crossover dispatch table must be pinned: a naive batched
call on TPU gets the tuned path; CPU and explicit settings are untouched."""

import jax.numpy as jnp

from ipddp2tpu import Options
from ipddp2tpu.autotune import tune


def test_dispatch_table_pinned():
    o = Options()
    # TPU f32, small batch: parallel backward + short speculative LS
    t = tune(o, 8, jnp.float32, backend="tpu")
    assert (t.backward_mode, t.ls_speculative) == ("parallel", 4)
    # TPU f32, large batch: megakernel backward + HYBRID line search
    # (spec-8 + sequential continuation; measured b2048: 23.4 vs 17.3)
    t = tune(o, 1024, jnp.float32, backend="tpu")
    assert (t.backward_mode, t.ls_speculative,
            t.ls_spec_continue) == ("scan", 8, True)
    # TPU f32 at the headline scale: K=4 hybrid (measured b2048, round 4:
    # 26.8-28.0 vs 25.3-25.8 OCPs/s at identical solved counts)
    t = tune(o, 2048, jnp.float32, backend="tpu")
    assert (t.backward_mode, t.ls_speculative,
            t.ls_spec_continue) == ("scan", 4, True)
    # TPU f64 endgame at batch: speculative-8 lanes (measured b1024 optimum)
    t = tune(o, 256, jnp.float64, backend="tpu")
    assert (t.backward_mode, t.ls_speculative,
            t.ls_spec_continue) == ("scan", 8, True)
    # TPU f64, small batch: reference sequential path
    t = tune(o, 8, jnp.float64, backend="tpu")
    assert (t.backward_mode, t.ls_speculative) == ("scan", 0)


def test_explicit_settings_win():
    o = Options(ls_speculative=16)
    t = tune(o, 256, jnp.float64, backend="tpu")
    assert t.ls_speculative == 16          # explicit beats the table
    assert t.backward_mode == "scan"       # default still filled

    o = Options(backward_mode="parallel")
    t = tune(o, 1024, jnp.float32, backend="tpu")
    assert t.backward_mode == "parallel"


def test_cpu_and_opt_out_are_noops():
    o = Options()
    assert tune(o, 8, jnp.float32, backend="cpu") is o
    o2 = Options(auto_tune=False)
    assert tune(o2, 8, jnp.float32, backend="tpu") is o2
