"""Evaluate any JAX-traceable function in df64 by jaxpr interpretation.

The forward/rollout megakernel must run USER model functions (dynamics,
costs, constraints) inside a Pallas TPU kernel at f64-equivalent precision —
but Mosaic has no f64, and asking users to hand-write double-single versions
of their models would break the framework's "write plain JAX" contract. This
module closes the gap generically: trace the function once at f64 avals (so
Python literals and closure constants keep full precision in the jaxpr),
then re-execute the jaxpr with every float value represented as a df64
(hi, lo) pair (`ops/df64.py`) and every float primitive routed through the
corresponding dd op. Constants are split exactly via `from_f64` at
interpretation (trace) time, so no f64 value ever reaches the kernel body —
the emitted program is pure f32 VPU arithmetic, Mosaic-safe.

Supported primitives cover the benchmark model families (elementwise
arithmetic + transcendentals, shape ops, small contractions, reductions,
comparisons/selects, nested calls); unsupported primitives raise at trace
time with the primitive's name, which is the eligibility signal the forward
kernel's auto dispatch uses (fall back to the XLA path).

Layout note: callers evaluating lane-batched values (shape [..., B]) should
pass a function already `jax.vmap`ed with in_axes/out_axes = -1 so the
jaxpr's shape parameters natively carry the trailing lane axis.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.extend import core as jcore

from . import df64 as dd
from .df64 import DF

F32 = jnp.float32


def _is_float(aval) -> bool:
    return jnp.issubdtype(aval.dtype, jnp.floating)


def _to_dd_const(x):
    """Concrete jaxpr constant/literal -> DF (floats) or plain array."""
    arr = np.asarray(x)
    if np.issubdtype(arr.dtype, np.floating):
        hi = arr.astype(np.float32)
        lo = (arr.astype(np.float64) - hi.astype(np.float64)).astype(
            np.float32)
        # non-finite hi: keep lo = 0 (inf - inf = nan), df64.from_f64 rule
        lo = np.where(np.isfinite(hi), lo, np.zeros_like(lo))
        return DF(jnp.asarray(hi), jnp.asarray(lo))
    if arr.dtype in (np.int64, np.uint64):
        arr = arr.astype(np.int32)      # Mosaic rejects i64 vectors
    return jnp.asarray(arr)


def _hi(v):
    return v.hi if isinstance(v, DF) else v


def _as_dd(v):
    if isinstance(v, DF):
        return v
    return DF(v.astype(F32), jnp.zeros(jnp.shape(v), F32))


def _shape_op(fn):
    """Apply a pure shape/layout op to hi and lo words independently."""

    def rule(*invals, **params):
        v = invals[0]
        if isinstance(v, DF):
            return DF(fn(v.hi, **params), fn(v.lo, **params))
        return fn(v, **params)

    return rule


def _nary_shape_op(fn):
    def rule(*invals, **params):
        if any(isinstance(v, DF) for v in invals):
            invals = [_as_dd(v) for v in invals]
            return DF(fn([v.hi for v in invals], **params),
                      fn([v.lo for v in invals], **params))
        return fn(list(invals), **params)

    return rule


def _cmp(op):
    def rule(a, b, **params):
        if isinstance(a, DF) or isinstance(b, DF):
            return op(_as_dd(a), _as_dd(b))
        return getattr(jax.lax, op.__name__)(a, b)

    return rule


def _select_n(pred, *cases, **params):
    if not any(isinstance(c, DF) for c in cases):
        return jax.lax.select_n(pred, *cases)
    cases = [_as_dd(c) for c in cases]
    if len(cases) == 2:
        return dd.where(pred, cases[1], cases[0])
    # general n-way: chain selects on the index
    out = cases[0]
    for i, c in enumerate(cases[1:], start=1):
        out = dd.where(pred == i, c, out)
    return out


def _integer_pow(a, *, y):
    a = _as_dd(a)
    if y == 0:
        return DF(jnp.ones_like(a.hi), jnp.zeros_like(a.lo))
    inv = y < 0
    y = abs(y)
    # square-and-multiply
    acc = None
    base = a
    while y:
        if y & 1:
            acc = base if acc is None else dd.mul(acc, base)
        y >>= 1
        if y:
            base = dd.mul(base, base)
    if inv:
        one = DF(jnp.ones_like(acc.hi), jnp.zeros_like(acc.lo))
        acc = dd.div(one, acc)
    return acc


def _reduce(op, identity=None):
    def rule(a, *, axes, **params):
        if not isinstance(a, DF):
            raise NotImplementedError("dd reduce of non-float")
        # move reduced axes first, then fold with a linear dd chain
        # (axis sizes in model functions are small and static)
        keep = [i for i in range(a.hi.ndim) if i not in axes]
        perm = list(axes) + keep
        hi = jnp.transpose(a.hi, perm)
        lo = jnp.transpose(a.lo, perm)
        n = int(np.prod([hi.shape[i] for i in range(len(axes))]) or 1)
        flat = DF(hi.reshape((n,) + hi.shape[len(axes):]),
                  lo.reshape((n,) + lo.shape[len(axes):]))
        acc = DF(flat.hi[0], flat.lo[0])
        for i in range(1, n):
            acc = op(acc, DF(flat.hi[i], flat.lo[i]))
        return acc

    return rule


def _dot_general(a, b, *, dimension_numbers, **params):
    """Small dd contraction: loop over the (static, small) contracting dims."""
    a = _as_dd(a)
    b = _as_dd(b)
    (lc, rc), (lb, rb) = dimension_numbers
    # move batch dims first, contracting dims last
    la = [i for i in range(a.hi.ndim) if i not in tuple(lc) + tuple(lb)]
    ra = [i for i in range(b.hi.ndim) if i not in tuple(rc) + tuple(rb)]
    pa = list(lb) + la + list(lc)
    pb = list(rb) + ra + list(rc)
    ah = jnp.transpose(a.hi, pa)
    al = jnp.transpose(a.lo, pa)
    bh = jnp.transpose(b.hi, pb)
    bl = jnp.transpose(b.lo, pb)
    nb = len(lb)
    nla, nra = len(la), len(ra)
    csize = int(np.prod(ah.shape[nb + nla:]) or 1)
    ah = ah.reshape(ah.shape[:nb + nla] + (csize,))
    al = al.reshape(al.shape[:nb + nla] + (csize,))
    bh = bh.reshape(bh.shape[:nb + nra] + (csize,))
    bl = bl.reshape(bl.shape[:nb + nra] + (csize,))
    # broadcast: a -> [batch, la, 1(ra)], b -> [batch, 1(la), ra]
    for _ in range(nra):
        ah = ah[..., None, :]
        al = al[..., None, :]
    for _ in range(nla):
        bh = jnp.expand_dims(bh, nb)
        bl = jnp.expand_dims(bl, nb)
    acc = None
    for k in range(csize):
        term = dd.mul(DF(ah[..., k], al[..., k]), DF(bh[..., k], bl[..., k]))
        acc = term if acc is None else dd.add(acc, term)
    return acc


def _convert(a, *, new_dtype, **params):
    if isinstance(a, DF):
        if jnp.issubdtype(new_dtype, jnp.floating):
            return a                       # all dd floats are "f64-like"
        return a.hi.astype(new_dtype)
    if jnp.issubdtype(new_dtype, jnp.floating):
        return DF(a.astype(F32), jnp.zeros(jnp.shape(a), F32))
    return a.astype(new_dtype)


def _iota(*, dtype, shape, dimension, **params):
    it = jax.lax.broadcasted_iota(jnp.int32, shape, dimension)
    if jnp.issubdtype(dtype, jnp.floating):
        return DF(it.astype(F32), jnp.zeros(shape, F32))
    return it.astype(dtype)


def _call_rule(*invals, jaxpr=None, call_jaxpr=None, **params):
    inner = jaxpr if jaxpr is not None else call_jaxpr
    if hasattr(inner, "jaxpr"):
        return _eval_jaxpr(inner.jaxpr, inner.consts, list(invals))
    return _eval_jaxpr(inner, [], list(invals))


def _custom_call_rule(*invals, call_jaxpr=None, **params):
    n = len(call_jaxpr.jaxpr.invars)
    return _eval_jaxpr(call_jaxpr.jaxpr, call_jaxpr.consts,
                       list(invals)[-n:] if n < len(invals)
                       else list(invals))


_RULES = {
    "add": lambda a, b, **_: dd.add(_as_dd(a), _as_dd(b)),
    "add_any": lambda a, b, **_: dd.add(_as_dd(a), _as_dd(b)),
    "sub": lambda a, b, **_: dd.sub(_as_dd(a), _as_dd(b)),
    "mul": lambda a, b, **_: dd.mul(_as_dd(a), _as_dd(b)),
    "div": lambda a, b, **_: dd.div(_as_dd(a), _as_dd(b)),
    "neg": lambda a, **_: dd.neg(_as_dd(a)),
    "abs": lambda a, **_: dd.abs_(_as_dd(a)),
    "sign": lambda a, **_: DF(jnp.sign(_hi(a)), jnp.zeros_like(_hi(a))),
    "max": lambda a, b, **_: dd.where(dd.lt(_as_dd(a), _as_dd(b)),
                                      _as_dd(b), _as_dd(a)),
    "min": lambda a, b, **_: dd.where(dd.lt(_as_dd(b), _as_dd(a)),
                                      _as_dd(b), _as_dd(a)),
    "sin": lambda a, **_: dd.sin(_as_dd(a)),
    "cos": lambda a, **_: dd.cos(_as_dd(a)),
    "tan": lambda a, **_: dd.tan(_as_dd(a)),
    "log": lambda a, **_: dd.log(_as_dd(a)),
    "exp": lambda a, **_: dd.exp(_as_dd(a)),
    "sqrt": lambda a, **_: dd.sqrt(_as_dd(a)),
    "integer_pow": _integer_pow,
    "is_finite": lambda a, **_: jnp.isfinite(_hi(a)),
    "lt": _cmp(dd.lt),
    "le": _cmp(dd.le),
    "gt": _cmp(lambda a, b: dd.lt(b, a)),
    "ge": _cmp(lambda a, b: dd.le(b, a)),
    "eq": _cmp(lambda a, b: (a.hi == b.hi) & (a.lo == b.lo)),
    "ne": _cmp(lambda a, b: (a.hi != b.hi) | (a.lo != b.lo)),
    "select_n": _select_n,
    "broadcast_in_dim": _shape_op(
        lambda x, *, shape, broadcast_dimensions, sharding=None:
        jax.lax.broadcast_in_dim(x, shape, broadcast_dimensions)),
    "reshape": _shape_op(
        lambda x, *, new_sizes, dimensions, sharding=None:
        jax.lax.reshape(x, new_sizes, dimensions)),
    "squeeze": _shape_op(
        lambda x, *, dimensions: jax.lax.squeeze(x, dimensions)),
    "expand_dims": _shape_op(
        lambda x, *, dimensions: jax.lax.expand_dims(x, dimensions)),
    "transpose": _shape_op(
        lambda x, *, permutation: jax.lax.transpose(x, permutation)),
    "rev": _shape_op(lambda x, *, dimensions: jax.lax.rev(x, dimensions)),
    "slice": _shape_op(
        lambda x, *, start_indices, limit_indices, strides:
        jax.lax.slice(x, start_indices, limit_indices, strides)),
    "concatenate": _nary_shape_op(
        lambda xs, *, dimension: jax.lax.concatenate(xs, dimension)),
    "reduce_sum": _reduce(dd.add),
    "reduce_max": _reduce(lambda a, b: dd.where(dd.lt(a, b), b, a)),
    "reduce_min": _reduce(lambda a, b: dd.where(dd.lt(b, a), b, a)),
    "dot_general": _dot_general,
    "convert_element_type": _convert,
    "iota": _iota,
    "stop_gradient": lambda a, **_: a,
    "copy": lambda a, **_: a,
    "pjit": _call_rule,
    "jit": _call_rule,   # jax >= 0.7 renamed the pjit primitive
    "closed_call": _call_rule,
    "custom_jvp_call": _custom_call_rule,
    "custom_vjp_call": _custom_call_rule,
    "custom_vjp_call_jaxpr": _custom_call_rule,
    "remat": _call_rule,
}


def _as_const(c):
    """Constant -> interpreter value. Already-converted DF pairs and traced
    arrays (kernel-supplied consts) pass through; concrete values split."""
    if isinstance(c, DF) or isinstance(c, jax.core.Tracer):
        return c
    return _to_dd_const(c)


def _eval_jaxpr(jaxpr, consts, args):
    env = {}

    def read(v):
        if isinstance(v, jcore.Literal):
            return _to_dd_const(v.val)
        return env[v]

    def write(v, val):
        env[v] = val

    for v, c in zip(jaxpr.constvars, consts):
        write(v, _as_const(c))
    for v, a in zip(jaxpr.invars, args):
        write(v, a)

    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        rule = _RULES.get(name)
        if rule is None:
            raise NotImplementedError(
                f"ddeval: no df64 rule for primitive '{name}'")
        invals = [read(v) for v in eqn.invars]
        params = dict(eqn.params)
        if name in ("pjit", "jit", "closed_call", "remat",
                    "custom_jvp_call", "custom_vjp_call",
                    "custom_vjp_call_jaxpr"):
            # strip transform-specific params; the rules only need the jaxpr
            params = {k: v for k, v in params.items()
                      if k in ("jaxpr", "call_jaxpr")}
        out = rule(*invals, **params)
        if eqn.primitive.multiple_results:
            for v, o in zip(eqn.outvars, out):
                write(v, o)
        else:
            write(eqn.outvars[0], out)

    return [read(v) for v in jaxpr.outvars]


def make_dd_jaxpr(fn, *args):
    """Trace `fn(*args)` at f64 avals for later df64 interpretation.

    Same aval convention as `dd_eval` (DF leaves -> f64 avals). Returns
    (closed_jaxpr, out_treedef); evaluate with `eval_dd_jaxpr`. Splitting
    trace from eval lets callers hoist the jaxpr's CONSTANTS out of a Pallas
    kernel (array constants may not be captured by kernel closures) and feed
    them back in as kernel inputs."""
    flat, treedef = jax.tree.flatten(args,
                                     is_leaf=lambda x: isinstance(x, DF))

    def template(v):
        if isinstance(v, DF):
            return jax.ShapeDtypeStruct(jnp.shape(v.hi), jnp.float64)
        return jax.ShapeDtypeStruct(jnp.shape(v), jnp.asarray(v).dtype)

    tpl = [template(v) for v in flat]
    closed = jax.make_jaxpr(
        lambda *xs: fn(*jax.tree.unflatten(treedef, xs)))(*tpl)
    out_tree = jax.tree.structure(
        jax.eval_shape(lambda *xs: fn(*jax.tree.unflatten(treedef, xs)),
                       *tpl))
    return closed, out_tree


def eval_dd_jaxpr(closed, out_tree, consts, *args):
    """Interpret a jaxpr from `make_dd_jaxpr` in df64.

    `consts` replaces the traced constants (pass DF pairs for float
    constants — e.g. values read from kernel refs); None uses the traced
    concrete constants directly."""
    flat, _ = jax.tree.flatten(args, is_leaf=lambda x: isinstance(x, DF))
    outs = _eval_jaxpr(closed.jaxpr,
                       closed.consts if consts is None else consts, flat)
    return jax.tree.unflatten(out_tree, outs)


def _dot_general_f32(a, b, *, dimension_numbers, **params):
    """Mosaic-safe dot_general: decomposed into mul + reduce over the
    (static, small) contracting dims — Mosaic's tpu.matmul lowering rejects
    the batched small-dot shapes model functions produce under vmap."""
    (lc, rc), (lb, rb) = dimension_numbers
    la = [i for i in range(a.ndim) if i not in tuple(lc) + tuple(lb)]
    ra = [i for i in range(b.ndim) if i not in tuple(rc) + tuple(rb)]
    pa = list(lb) + la + list(lc)
    pb = list(rb) + ra + list(rc)
    ah = jnp.transpose(a, pa)
    bh = jnp.transpose(b, pb)
    nb, nla, nra = len(lb), len(la), len(ra)
    csize = int(np.prod(ah.shape[nb + nla:]) or 1)
    ah = ah.reshape(ah.shape[:nb + nla] + (csize,))
    bh = bh.reshape(bh.shape[:nb + nra] + (csize,))
    for _ in range(nra):
        ah = ah[..., None, :]
    for _ in range(nla):
        bh = jnp.expand_dims(bh, nb)
    acc = None
    for k in range(csize):
        term = ah[..., k] * bh[..., k]
        acc = term if acc is None else acc + term
    return acc


def _eval_mosaic(jaxpr, consts, invals):
    """bind-based jaxpr replay with Mosaic-safe overrides (recursive into
    call primitives)."""
    env = {}

    def read(v):
        if isinstance(v, jcore.Literal):
            val = np.asarray(v.val)
            if val.dtype in (np.int64, np.uint64):
                val = val.astype(np.int32)
            return jnp.asarray(val)
        return env[v]

    for v, c in zip(jaxpr.constvars, consts):
        env[v] = c if isinstance(c, jax.core.Tracer) else jnp.asarray(c)
    for v, a in zip(jaxpr.invars, invals):
        env[v] = a
    for eqn in jaxpr.eqns:
        iv = [read(v) for v in eqn.invars]
        if eqn.primitive.name == "dot_general":
            out = _dot_general_f32(*iv, dimension_numbers=eqn.params[
                "dimension_numbers"])
        elif eqn.primitive.name in ("pjit", "jit",
                                    "closed_call", "remat"):
            inner = eqn.params.get("jaxpr") or eqn.params.get("call_jaxpr")
            sub = inner.jaxpr if hasattr(inner, "jaxpr") else inner
            sub_consts = inner.consts if hasattr(inner, "consts") else []
            out = _eval_mosaic(sub, sub_consts, iv)
        else:
            out = eqn.primitive.bind(*iv, **eqn.params)
        if eqn.primitive.multiple_results:
            for v, o in zip(eqn.outvars, out):
                env[v] = o
        else:
            env[eqn.outvars[0]] = out
    return [read(v) for v in jaxpr.outvars]


def eval_jaxpr_mosaic(closed, out_tree, consts, *args):
    """Evaluate a traced model jaxpr with plain f32 semantics inside a
    Pallas TPU kernel: primitives replay via `bind` except the ones whose
    default lowering Mosaic rejects (small-dot dot_general)."""
    outs = _eval_mosaic(closed.jaxpr,
                        closed.consts if consts is None else consts,
                        jax.tree.leaves(args))
    return jax.tree.unflatten(out_tree, outs)


def dd_eval(fn, *args):
    """Evaluate `fn(*args)` in df64.

    `args` is a pytree whose float leaves are DF pairs (f32 hi/lo arrays) and
    whose other leaves (ints, bools) are plain arrays. The function is traced
    ONCE at f64 avals matching the DF leaves' shapes — Python float literals
    and closure constants therefore enter the jaxpr at full f64 precision and
    are split exactly into DF constants. Returns the output pytree with DF
    leaves in place of float outputs.

    Raises NotImplementedError at trace time if the function uses a primitive
    without a df64 rule — the eligibility signal for kernel auto-dispatch.
    """
    flat, treedef = jax.tree.flatten(args, is_leaf=lambda x: isinstance(x, DF))

    def template(v):
        if isinstance(v, DF):
            return jax.ShapeDtypeStruct(jnp.shape(v.hi), jnp.float64)
        return jax.ShapeDtypeStruct(jnp.shape(v), jnp.asarray(v).dtype)

    closed = jax.make_jaxpr(
        lambda *xs: fn(*jax.tree.unflatten(treedef, xs)))(
        *[template(v) for v in flat])
    outs = _eval_jaxpr(closed.jaxpr, closed.consts, list(flat))
    out_tree = jax.tree.structure(
        jax.eval_shape(lambda *xs: fn(*jax.tree.unflatten(treedef, xs)),
                       *[template(v) for v in flat]))
    return jax.tree.unflatten(out_tree, outs)
