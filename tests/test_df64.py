"""df64 (double-single) arithmetic accuracy contract (ops/df64.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from ipddp2tpu.ops import df64

EPS48 = 2.0 ** -47


def _rand(key, n=4096, scale=1.0):
    a64 = scale * (jax.random.uniform(key, (n,), jnp.float64) - 0.5)
    return a64, df64.from_f64(a64)


def _relerr(got: "df64.DF", want64):
    g = np.asarray(df64.to_f64(got))
    w = np.asarray(want64)
    return np.max(np.abs(g - w) / np.maximum(np.abs(w), 1e-300))


def test_roundtrip():
    a64, a = _rand(jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(df64.to_f64(a)), np.asarray(a64),
                               rtol=EPS48)


def test_add_sub_mul_div():
    ka, kb = jax.random.split(jax.random.PRNGKey(1))
    a64, a = _rand(ka)
    b64, b = _rand(kb, scale=3.0)
    mag = np.maximum(np.abs(np.asarray(a64)), np.abs(np.asarray(b64)))

    def abserr(got, want64):
        return np.max(np.abs(np.asarray(df64.to_f64(got))
                             - np.asarray(want64)) / mag)

    # add/sub: error bounded relative to the OPERANDS (cancellation amplifies
    # the inputs' own 2^-48 representation error; that is not arithmetic
    # error). mul/div: plain relative error.
    assert abserr(df64.add(a, b), a64 + b64) < 4 * EPS48
    assert abserr(df64.sub(a, b), a64 - b64) < 4 * EPS48
    assert _relerr(df64.mul(a, b), a64 * b64) < 8 * EPS48
    assert _relerr(df64.div(a, b), a64 / b64) < 8 * EPS48


def test_graded_dot_product():
    """The solver's failure mode: graded sums (Sigma ~ 1e10 terms against
    O(1) terms). Plain f32 loses everything; df64 keeps ~1e-14."""
    key = jax.random.PRNGKey(2)
    ka, kb = jax.random.split(key)
    scales = jnp.asarray(10.0, jnp.float64) ** jax.random.randint(
        ka, (512,), -5, 10)
    a64 = scales * (jax.random.uniform(kb, (512,), jnp.float64) - 0.5)
    b64 = jax.random.uniform(ka, (512,), jnp.float64) - 0.5

    a, b = df64.from_f64(a64), df64.from_f64(b64)
    acc = df64.DF(jnp.zeros((), jnp.float32), jnp.zeros((), jnp.float32))
    for i in range(512):
        acc = df64.add(acc, df64.mul(
            jax.tree.map(lambda x: x[i], a), jax.tree.map(lambda x: x[i], b)))
    want = float(jnp.sum(a64 * b64))
    got = float(df64.to_f64(acc))
    assert abs(got - want) / abs(want) < 1e-12
    # and f32 alone genuinely fails this (sanity that the test discriminates)
    f32_err = abs(float(jnp.sum(a64.astype(jnp.float32)
                                * b64.astype(jnp.float32))) - want) / abs(want)
    assert f32_err > 1e-8


def test_comparisons_and_select():
    ka, kb = jax.random.split(jax.random.PRNGKey(3))
    a64, a = _rand(ka)
    b64, b = _rand(kb)
    np.testing.assert_array_equal(np.asarray(df64.lt(a, b)),
                                  np.asarray(a64 < b64))
    sel = df64.where(df64.lt(a, b), a, b)
    np.testing.assert_allclose(np.asarray(df64.to_f64(sel)),
                               np.minimum(np.asarray(a64), np.asarray(b64)),
                               rtol=EPS48)
    z = df64.sub(a, a)
    assert bool(jnp.all(df64.eq_zero(z)))


def test_transcendentals():
    """sin/cos/log/exp/sqrt to the df64 contract: error within a few ulps of
    max(|a|, 1) * 2^-48 — the conditioning floor of a 48-bit input (absolute
    near zeros of sin/cos and for |log| < 1). The lo word degrades only
    outside the f32 normal range (|result| < ~1e-30)."""
    rng = np.random.default_rng(7)

    def err(fn, ref, xs, abs_floor=0.0, cond=1.0):
        a = df64.from_f64(jnp.asarray(xs))
        r = np.asarray(df64.to_f64(fn(a)))
        expect = ref(xs)
        return np.max(np.abs(r - expect)
                      / np.maximum(np.abs(expect), max(abs_floor, 1e-300))
                      / np.maximum(np.abs(xs) * cond, 1.0))

    ULPS = 8 * 2.0 ** -48
    assert err(df64.log, np.log,
               np.concatenate([rng.uniform(1e-9, 1e-6, 200),
                               rng.uniform(0.1, 10.0, 200),
                               rng.uniform(1e3, 1e9, 200)]),
               abs_floor=1.0, cond=0.0) < ULPS
    assert err(df64.exp, np.exp,
               np.concatenate([rng.uniform(-60.0, 60.0, 300),
                               rng.uniform(-0.1, 0.1, 100)])) < ULPS
    assert err(df64.sin, np.sin, rng.uniform(-10, 10, 400),
               abs_floor=1.0) < ULPS
    assert err(df64.cos, np.cos, rng.uniform(-10, 10, 400),
               abs_floor=1.0) < ULPS
    assert err(df64.sqrt, np.sqrt, rng.uniform(1e-12, 1e12, 300),
               cond=0.0) < ULPS
    # exact edge semantics
    assert float(df64.to_f64(df64.sqrt(df64.from_f64(jnp.asarray(0.0))))) == 0
    assert np.isinf(float(df64.exp(df64.from_f64(jnp.asarray(200.0))).hi))
    assert np.isnan(float(df64.log(df64.from_f64(jnp.asarray(-1.0))).hi))
