"""Double-single ("df64") arithmetic: ~48-bit-mantissa reals as f32 pairs.

TPU v5e has no native f64 vector unit; XLA emulates f64 op-by-op, which makes
the f64 endgame iteration ~10-30x the f32 cost and — worse — keeps the
latency-bound op-dispatch chain long. Pallas/Mosaic rejects f64 entirely. The
TPU-native answer is classic double-single arithmetic (Dekker 1971; Knuth
TwoSum): every value is an unevaluated sum hi + lo of two f32, giving a unit
roundoff of 2^-48 ~ 3.6e-15 — enough for the solver's graded KKT systems
(condition ~ kappa_Sigma = 1e10 at mu = 1e-8, reference src/options.jl:36:
eps * cond ~ 4e-5 << 1, so refined LDL^T solves recover componentwise
accuracy exactly as the f64 path does).

All functions are elementwise on (hi, lo) pairs of equal-shape f32 arrays and
lower to plain VPU adds/muls/selects — Mosaic-safe, usable inside the
backward megakernel. Error-free transforms use Dekker splitting, NOT fma
(Mosaic gives no single-rounding fma guarantee). XLA does not reassociate
floating-point expressions, so the exact sequences below survive compilation.

Accuracy contract (pinned by tests/test_df64.py): add/sub/mul/div relative
error < 2^-47 on well-scaled inputs; comparisons are exact on hi.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

_SPLIT = 4097.0          # 2^12 + 1 splits a 24-bit mantissa into 12+12


class DF(NamedTuple):
    """An unevaluated f32 sum: value = hi + lo, |lo| <= ulp(hi)/2."""
    hi: jax.Array
    lo: jax.Array


def _two_sum(a, b):
    """Knuth TwoSum: s + e == a + b exactly (6 flops, no branch)."""
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def _quick_two_sum(a, b):
    """Dekker FastTwoSum, requires |a| >= |b|: s + e == a + b exactly."""
    s = a + b
    e = b - (s - a)
    return s, e


def _split(a):
    t = jnp.float32(_SPLIT) * a
    hi = t - (t - a)
    return hi, a - hi


def _two_prod(a, b):
    """p + e == a * b exactly (Dekker product via splitting; no fma)."""
    p = a * b
    ah, al = _split(a)
    bh, bl = _split(b)
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, e


def from_f32(x) -> DF:
    return DF(x, jnp.zeros_like(x))


def from_f64(x) -> DF:
    """Split an f64 array into a df64 pair (host/XLA side, not in-kernel).

    Non-finite values keep lo = 0 (inf - inf would poison it with NaN);
    ±inf semantics then live entirely in hi, as in plain f32."""
    hi = x.astype(jnp.float32)
    lo = jnp.where(jnp.isfinite(hi),
                   (x - jnp.where(jnp.isfinite(hi), hi, 0
                                  ).astype(jnp.float64)).astype(jnp.float32),
                   jnp.zeros_like(hi))
    return DF(hi, lo)


def to_f64(a: DF):
    return a.hi.astype(jnp.float64) + a.lo.astype(jnp.float64)


def add(a: DF, b: DF) -> DF:
    s, e = _two_sum(a.hi, b.hi)
    e = e + a.lo + b.lo
    return DF(*_quick_two_sum(s, e))


def sub(a: DF, b: DF) -> DF:
    return add(a, neg(b))


def neg(a: DF) -> DF:
    return DF(-a.hi, -a.lo)


def mul(a: DF, b: DF) -> DF:
    p, e = _two_prod(a.hi, b.hi)
    e = e + a.hi * b.lo + a.lo * b.hi
    return DF(*_quick_two_sum(p, e))


def div(a: DF, b: DF) -> DF:
    """Two-step long division: q0 = a.hi/b.hi, then one df64 correction."""
    q0 = a.hi / b.hi
    r = sub(a, mul(DF(q0, jnp.zeros_like(q0)), b))
    q1 = (r.hi + r.lo) / b.hi
    return DF(*_quick_two_sum(q0, q1))


def abs_(a: DF) -> DF:
    flip = a.hi < 0
    return DF(jnp.where(flip, -a.hi, a.hi), jnp.where(flip, -a.lo, a.lo))


def where(pred, a: DF, b: DF) -> DF:
    return DF(jnp.where(pred, a.hi, b.hi), jnp.where(pred, a.lo, b.lo))


def zeros_like(a: DF) -> DF:
    return DF(jnp.zeros_like(a.hi), jnp.zeros_like(a.lo))


# comparisons: exact on normalized pairs via (hi, then lo on hi-ties)
def lt(a: DF, b: DF):
    return (a.hi < b.hi) | ((a.hi == b.hi) & (a.lo < b.lo))


def le(a: DF, b: DF):
    return (a.hi < b.hi) | ((a.hi == b.hi) & (a.lo <= b.lo))


def eq_zero(a: DF):
    return (a.hi == 0.0) & (a.lo == 0.0)
