"""Measured-crossover dispatch: pick the tuned execution mode automatically.

The framework has several execution modes whose crossover points were
measured on real hardware (docs/PERF.md, CLAUDE.md round-1/2 findings) but
previously had to be selected by hand:

  * backward_mode "scan" vs "parallel" (associative-scan Riccati): the
    parallel mode nearly halves per-iteration latency when few instances
    share the chip (TPU f32 b8: -24% combined with a short speculative line
    search; CPU single-instance backward: -46%) but LOSES at large batch
    (TPU b64: 582 ms vs 316 ms per batch-iteration) where the sequential
    megakernel path amortizes its launch over lanes.
  * line search backtracking vs speculative-K: the f64 endgame is
    compute-bound, and sequential backtracking trial counts are
    max-over-batch; K=8 speculative lanes measured 12.6 vs 9.3 OCPs/s at
    b1024 (K=16: 10.9 — lanes multiply rollout work). In the f32 bulk phase
    speculative LS is a net success LOSS at large batch (instances fail at
    k=30-210 that sequential backtracking saves), so it stays sequential.

`tune` encodes those tables. It only fills knobs still at their dataclass
defaults (an explicit user setting always wins) and only when
`options.auto_tune` is on; off-TPU it is a no-op — CPU is the
test/verification backend and keeps exact reference-path semantics.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from .options import Options

# (dtype, min_batch_inclusive, max_batch_exclusive) -> overrides.
# Batch boundaries sit between measured points (parallel wins at b8, loses
# at b64 -> cross at 32; endgame speculative-8 measured at b256..b2048,
# first helpful entry at b256 in the ladder history -> floor 64 where the
# df64 kernel measurements start).
TUNE_TABLE = (
    ("float32", 1, 32, {"backward_mode": "parallel", "ls_speculative": 4}),
    # large-batch f32: HYBRID line search (K speculative lanes + sequential
    # continuation below 2^-K — same largest-acceptable-gamma semantics as
    # pure backtracking, so the measured spec-only success loss does not
    # apply). Measured b2048 mixed: 23.4 vs 17.3-18.3 OCPs/s sequential
    # (the max-over-batch backtracking chains collapse to one batched
    # evaluation).
    ("float32", 32, 2048, {"backward_mode": "scan", "ls_speculative": 8,
                           "ls_spec_continue": True}),
    # at b2048 the batched K-candidate forward eval dominates the f32
    # iteration (~28 of ~75 ms at b1024); K=4 halves it and the sequential
    # continuation keeps semantics. Measured round 4 (4 reps each, same
    # solved counts and success rung): K=4 26.8/28.0/26.9/27.9 vs K=8
    # 25.3/25.4/25.8 OCPs/s.
    ("float32", 2048, None, {"backward_mode": "scan", "ls_speculative": 4,
                             "ls_spec_continue": True}),
    ("float64", 64, None, {"backward_mode": "scan", "ls_speculative": 8,
                           "ls_spec_continue": True}),
    ("float64", 1, 64, {"backward_mode": "scan", "ls_speculative": 0}),
)


def tune(options: Options, batch_size: int, dtype,
         backend: str | None = None) -> Options:
    """Return `options` with mode knobs tuned for (batch, dtype, backend).

    Only knobs still at their `Options` defaults are touched, and only on a
    TPU backend with `options.auto_tune` enabled.
    """
    backend = backend or jax.default_backend()
    if not options.auto_tune or backend != "tpu":
        return options
    name = jnp.dtype(dtype).name
    row = next((o for (dt, lo, hi, o) in TUNE_TABLE
                if dt == name and lo <= batch_size
                and (hi is None or batch_size < hi)), None)
    if row is None:
        return options
    defaults = {f.name: f.default for f in dataclasses.fields(Options)}
    updates = {k: v for k, v in row.items()
               if getattr(options, k) == defaults[k]}
    return dataclasses.replace(options, **updates) if updates else options
