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

CAVEAT — XLA:CPU compiled programs: the contract holds op-by-op (eager) and
under Mosaic on real TPU (no FMA contraction; verified on-chip by
scripts/tpu_dd_probe.py and by the round-2 golden replays through the df64
backward megakernel), but XLA:CPU's LLVM backend contracts mul+add chains
inside COMPILED programs (jit bodies, interpret-mode Pallas), degrading the
error-free transforms to ~1e-12-1e-13 per op — measured ~1e-10 accumulated
over a 100-stage recursion, identical with `optimization_barrier`s inserted
(it is backend codegen, not HLO rewriting). Interpret-mode kernel parity
tests therefore assert at ~1e-8, not 2^-48; on-chip precision is pinned by
the TPU probe.
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


# ---------------------------------------------------------------------------
# Transcendentals (needed by the forward/rollout megakernel: model dynamics
# use sin/cos, the barrier Lagrangian uses log). All are Mosaic-safe
# compositions of VPU ops: f32 seed from the hardware transcendental unit,
# then df64 argument reduction + polynomial/Newton refinement.
#
# Accuracy contract: error ~ max(|a|, 1) * 2^-48 — the CONDITIONING floor of
# a 48-bit-mantissa input (a two-f32-word argument only determines exp/sin
# to |a|*2^-48 absolutely; no algorithm can beat that), reached up to a few
# ulps. For the solver this is ample: dynamics headings and barrier slacks
# are O(1)-scaled, giving ~4e-15 — far below the 1e-7 KKT target and the
# same regime as the df64 linear algebra. Each constant is a Cody-Waite
# multi-word split so range-reduction products with small integers stay
# exact in f32.
# ---------------------------------------------------------------------------

def _const(v: float):
    import numpy as np
    hi = np.float32(v)
    return float(hi), float(np.float32(v - float(hi)))


_LN2 = _const(0.6931471805599453)
_PIO2 = _const(1.5707963267948966)
_INV_FACT = [_const(1.0 / __import__("math").factorial(n))
             for n in range(2, 20)]


def _cody_waite(v: float, bits: int = 12, terms: int = 3):
    """Split v into `terms` words whose leading words carry <= `bits`
    significant bits each, so products with small-integer k are EXACT in f32
    (k*c1 and k*c2 round-free; only the tiny tail word rounds). The classic
    Cody-Waite range-reduction constant scheme."""
    import math

    import numpy as np
    out = []
    rem = v
    for i in range(terms - 1):
        if rem == 0.0:
            out.append(0.0)
            continue
        e = math.floor(math.log2(abs(rem))) + 1
        c = math.ldexp(round(math.ldexp(rem, bits - e)), e - bits)
        out.append(float(np.float32(c)))
        rem -= out[-1]
    out.append(float(np.float32(rem)))
    return tuple(out)


_LN2_CW = _cody_waite(0.6931471805599453)
_PIO2_CW = _cody_waite(1.5707963267948966)


def _reduce(a: DF, k, cw) -> DF:
    """r = a - k * c  with c given as Cody-Waite words (k exact integer
    float, |k| small): the leading products are exact, the subtractions are
    error-free TwoSums, leaving only the tail word's rounding (~1e-16 k)."""
    dt = a.hi.dtype
    r = a
    for c in cw:
        p = k * jnp.asarray(c, dt)          # exact for the leading words
        r = add(r, DF(-p, jnp.zeros_like(p)))
    return r


def _cst(c, like) -> DF:
    """Broadcast a (hi, lo) Python constant pair against an array."""
    z = jnp.zeros_like(like)
    return DF(z + jnp.asarray(c[0], z.dtype), z + jnp.asarray(c[1], z.dtype))


def _exp2i(n):
    """EXACT 2**n for integer-valued float n in [-127, 127].

    `jnp.exp2` lowers to a polynomial approximation on some backends (its
    error at integer arguments silently destroys df64 range reductions —
    measured 1e-7-level), so the power of two is assembled from exact
    bit factors: every partial product is itself a power of two, and f32
    multiplication of powers of two is exact throughout the normal range."""
    dt = n.dtype
    neg = n < 0
    m = jnp.abs(n)
    s = jnp.ones_like(n)
    for i in range(7):                       # bits 1, 2, 4, ..., 64
        bit = jnp.floor(m * jnp.asarray(0.5 ** i, dt)) % 2.0 >= 1.0
        fp = jnp.asarray(2.0 ** (2 ** i), dt)
        fn = jnp.asarray(2.0 ** -(2 ** i), dt)
        s = s * jnp.where(bit, jnp.where(neg, fn, fp), jnp.ones((), dt))
    return s


def sqrt(a: DF) -> DF:
    """df64 square root (a >= 0; 0 maps to 0)."""
    safe = jnp.where(a.hi > 0, a.hi, jnp.ones_like(a.hi))
    y = jnp.sqrt(safe)
    t = DF(y, jnp.zeros_like(y))
    u = from_f32(jnp.float32(0.5) / y)
    for _ in range(2):                       # Newton: t += (a - t^2) * (1/(2y))
        e = sub(a, mul(t, t))
        t = add(t, mul(e, u))
    zero = DF(jnp.zeros_like(a.hi), jnp.zeros_like(a.lo))
    return where(a.hi > 0, t, zero)


def exp(a: DF) -> DF:
    """df64 exponential: range reduction by ln2, scaled Taylor, square-up."""
    dt = a.hi.dtype
    k = jnp.round(a.hi / jnp.asarray(_LN2[0], dt))
    r = _reduce(a, k, _LN2_CW)
    # r in ~[-0.347, 0.347]; scale to r/8, expm1 Taylor to order 9
    r = DF(r.hi * jnp.asarray(0.125, dt), r.lo * jnp.asarray(0.125, dt))
    # p = r + r^2/2! + ... + r^9/9!  (Horner)
    p = _cst(_INV_FACT[7], a.hi)             # 1/9!
    for n in range(8, 1, -1):                # 1/8! ... 1/2!
        p = add(mul(p, r), _cst(_INV_FACT[n - 2], a.hi))
    p = mul(mul(p, r), r)
    p = add(p, r)                            # expm1(r/8)
    for _ in range(3):                       # expm1(2x) = 2p + p^2
        p = add(add(p, p), mul(p, p))
    one = DF(jnp.ones_like(a.hi), jnp.zeros_like(a.lo))
    ex = add(one, p)
    # saturate like f32 exp outside the representable exponent range
    kc = jnp.clip(k, -126.0, 126.0)
    s = _exp2i(kc)
    r = DF(ex.hi * s, ex.lo * s)
    inf = jnp.asarray(float("inf"), a.hi.dtype)
    r = where(k > 126.0, DF(jnp.full_like(a.hi, inf), jnp.zeros_like(a.lo)),
              r)
    return where(k < -126.0, zeros_like(DF(a.hi, a.lo)), r)


def log(a: DF) -> DF:
    """df64 natural log (a > 0): exact 2^e split + atanh series.

    log x = e ln2 + 2 atanh((m-1)/(m+1)),  m = x 2^-e in [~0.71, ~1.42].
    """
    dt = a.hi.dtype
    safe = jnp.where(a.hi > 0, a.hi, jnp.ones_like(a.hi))
    e = jnp.round(jnp.log2(safe))
    s = _exp2i(-e)
    m = DF(safe * s, jnp.where(a.hi > 0, a.lo, jnp.zeros_like(a.lo)) * s)
    one = DF(jnp.ones_like(a.hi), jnp.zeros_like(a.lo))
    t = div(sub(m, one), add(m, one))        # |t| <= 0.1716
    t2 = mul(t, t)
    # atanh(t)/t = 1 + t^2/3 + t^4/5 + ... + t^18/19  (Horner)
    acc = _cst(_const(1.0 / 19.0), a.hi)
    for n in range(17, 0, -2):
        acc = add(mul(acc, t2), _cst(_const(1.0 / n), a.hi))
    atanh = mul(acc, t)
    res = add(mul(DF(e, jnp.zeros_like(e)), _cst(_LN2, a.hi)),
              add(atanh, atanh))
    nan = jnp.asarray(float("nan"), dt)
    return where(a.hi > 0, res, DF(jnp.full_like(a.hi, nan),
                                   jnp.zeros_like(a.lo)))


def _sincos_poly(r: DF):
    """sin and cos on |r| <= pi/4 via df64 Taylor (to r^17 / r^16)."""
    r2 = mul(r, r)
    one = DF(jnp.ones_like(r.hi), jnp.zeros_like(r.lo))
    # sin(r)/r = 1 - r^2/3! + r^4/5! - ... - r^16/17!
    s = _cst(_INV_FACT[15], r.hi)            # 1/17!
    for n in (15, 13, 11, 9, 7, 5, 3):
        s = add(neg(mul(s, r2)), _cst(_INV_FACT[n - 2], r.hi))
    s = mul(add(neg(mul(s, r2)), one), r)
    # cos(r) = 1 - r^2/2! + r^4/4! - ... + r^16/16!
    c = _cst(_INV_FACT[14], r.hi)            # 1/16!
    for n in (14, 12, 10, 8, 6, 4, 2):
        c = add(neg(mul(c, r2)), _cst(_INV_FACT[n - 2], r.hi))
    c = add(neg(mul(c, r2)), one)
    return s, c


def sincos(a: DF):
    """df64 (sin a, cos a). Argument reduction uses the two-word pi/2, exact
    to 2^-48 relative for |a| up to ~1e3 — ample for control headings."""
    k = jnp.round(a.hi * jnp.asarray(0.6366197723675814, a.hi.dtype))
    r = _reduce(a, k, _PIO2_CW)
    s, c = _sincos_poly(r)
    # quadrant: k mod 4 (k is an exact small float)
    q = k - 4.0 * jnp.floor(k * 0.25)
    sin_q = where(q == 0.0, s,
                  where(q == 1.0, c,
                        where(q == 2.0, neg(s), neg(c))))
    cos_q = where(q == 0.0, c,
                  where(q == 1.0, neg(s),
                        where(q == 2.0, neg(c), s)))
    return sin_q, cos_q


def sin(a: DF) -> DF:
    return sincos(a)[0]


def cos(a: DF) -> DF:
    return sincos(a)[1]


def tan(a: DF) -> DF:
    s, c = sincos(a)
    return div(s, c)
