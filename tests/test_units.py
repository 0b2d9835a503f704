"""Pure-function unit tests prescribed by SURVEY.md §4: derivative bundles vs
finite differences, fraction-to-boundary, filter acceptance, barrier
schedule, and the interior projection."""

import jax
import jax.numpy as jnp
import numpy as np

from ipddp2tpu.derivatives import evaluate_derivatives
from ipddp2tpu.forward import Trial, filter_blocks, fraction_to_boundary_ok
from ipddp2tpu.models import concar
from ipddp2tpu.options import Options
from ipddp2tpu.problem import Bounds
from ipddp2tpu.solve import _augment_filter, _reset_filter, initialize


def test_derivatives_match_finite_differences():
    prob = concar.problem()
    theta, f_lim, tau_lim, x1 = concar.seed1_instance()
    rng = np.random.default_rng(0)
    T = prob.T
    x = jnp.asarray(rng.standard_normal((T + 1, prob.nx)) * 0.3)
    u = jnp.asarray(rng.standard_normal((T, prob.nu)) * 0.3)
    phi = jnp.asarray(rng.standard_normal((T, prob.nc)) * 0.5)
    d = evaluate_derivatives(prob, theta, x, u, phi)

    t = 17
    eps = 1e-6
    f0 = np.asarray(prob.dynamics(x[t], u[t], t, theta))
    for j in range(prob.nx):
        dx = np.zeros(prob.nx)
        dx[j] = eps
        f1 = np.asarray(prob.dynamics(x[t] + dx, u[t], t, theta))
        np.testing.assert_allclose((f1 - f0) / eps, np.asarray(d.fx[t][:, j]),
                                   rtol=1e-4, atol=1e-5)
    c0 = np.asarray(prob.constraints(x[t], u[t], t, theta))
    for j in range(prob.nu):
        du = np.zeros(prob.nu)
        du[j] = eps
        c1 = np.asarray(prob.constraints(x[t], u[t] + jnp.asarray(du), t,
                                         theta))
        np.testing.assert_allclose((c1 - c0) / eps, np.asarray(d.cu[t][:, j]),
                                   rtol=1e-4, atol=1e-5)
    # phi-contracted constraint Hessian vs FD of the gradient of <phi, c>
    g = jax.grad(lambda z: jnp.dot(phi[t], prob.constraints(
        z[:prob.nx], z[prob.nx:], t, theta)))
    z0 = jnp.concatenate([x[t], u[t]])
    for j in range(3):
        dz = np.zeros(prob.nx + prob.nu)
        dz[j] = eps
        col = (np.asarray(g(z0 + jnp.asarray(dz))) - np.asarray(g(z0))) / eps
        np.testing.assert_allclose(col, np.asarray(d.cH_phi[t][:, j]),
                                   rtol=1e-4, atol=1e-5)


def _trial(il, iu, zl, zu):
    z = jnp.zeros((2, 2))
    return Trial(x=z, u=z, c_raw=z, il=jnp.asarray(il), iu=jnp.asarray(iu),
                 phi=z, zl=jnp.asarray(zl), zu=jnp.asarray(zu))


def test_fraction_to_boundary():
    nom = jnp.full((2, 2), 1.0)
    tau = 0.99
    # current slightly below (1 - tau) * nominal fails; above passes
    ok = fraction_to_boundary_ok(
        _trial(jnp.full((2, 2), 0.02), nom, nom, nom), nom, nom, nom, nom,
        tau)
    assert bool(ok)
    bad = fraction_to_boundary_ok(
        _trial(jnp.full((2, 2), 0.005), nom, nom, nom), nom, nom, nom, nom,
        tau)
    assert not bool(bad)
    # infinite slacks (absent bounds) pass vacuously
    inf = jnp.full((2, 2), jnp.inf)
    ok = fraction_to_boundary_ok(_trial(inf, inf, 0 * nom, 0 * nom),
                                 inf, inf, 0 * nom, 0 * nom, tau)
    assert bool(ok)


def test_filter_semantics():
    opts = Options()
    pts = _reset_filter(jnp.zeros((8, 2)), jnp.asarray(1e4))
    # reset filter blocks only theta >= theta_max
    assert not bool(filter_blocks(pts, 1.0, -1e9))
    assert bool(filter_blocks(pts, 1e4, -1e9))
    # augment with the current pair; dominated trial points are blocked
    pts, n = _augment_filter(pts, jnp.int32(1), jnp.asarray(1.0),
                             jnp.asarray(5.0), opts)
    assert bool(filter_blocks(pts, 1.0, 5.0))
    assert not bool(filter_blocks(pts, 0.5, 5.0))     # better theta
    assert not bool(filter_blocks(pts, 1.0, 4.0))     # better L
    # ring overwrite never touches the sentinel slot 0
    for k in range(20):
        pts, n = _augment_filter(pts, n, jnp.asarray(2.0 + k),
                                 jnp.asarray(1.0), opts)
    assert float(pts[0, 0]) == 1e4


def test_barrier_schedule():
    """mu <- max(tol/10, min(kappa_mu mu, mu^theta_mu))
    (reference: src/solve.jl:62)."""
    tol, kappa_mu, theta_mu = 1e-7, 0.2, 1.2
    mu = 1.0
    seq = []
    for _ in range(12):
        mu = max(tol / 10, min(kappa_mu * mu, mu ** theta_mu))
        seq.append(mu)
    np.testing.assert_allclose(seq[:4], [0.2, 0.04, 0.008, 0.0016])
    assert seq[-1] == tol / 10           # floor reached
    assert all(a > b for a, b in zip(seq, seq[1:]) if b > tol / 10)


def test_interior_projection():
    """Initialization must place controls strictly inside their bounds
    (reference: src/solver.jl:54-105)."""
    prob = concar.problem()
    theta, f_lim, tau_lim, x1 = concar.seed1_instance()
    bounds = concar.bounds(f_lim, tau_lim)
    # a deliberately infeasible guess
    u0 = jnp.concatenate([
        jnp.full((prob.T, 2), 100.0),
        jnp.full((prob.T, concar.NU - 2), -3.0)], axis=1)
    s = initialize(prob, theta, bounds, x1, u0, Options())
    assert float(jnp.min(s.il)) > 0
    assert float(jnp.min(s.iu)) > 0
    assert bool(jnp.all(jnp.isfinite(s.x)))


def test_inertia_method_auto_resolution():
    """inertia_method="auto" resolves per problem: "bk" on problems that
    declare complementarity structure (compl_indices or contact=True),
    "ldl" otherwise — and an explicit setting always wins."""
    from ipddp2tpu.models import cartpole
    from ipddp2tpu.solve import resolve_options

    assert resolve_options(Options(), concar.problem()).inertia_method == "ldl"
    assert resolve_options(Options(),
                           cartpole.problem()).inertia_method == "bk"
    explicit = Options(inertia_method="eigh")
    assert resolve_options(explicit,
                           cartpole.problem()).inertia_method == "eigh"
    # hash-stable across calls (jit static-arg cache friendliness)
    a = resolve_options(Options(), concar.problem())
    b = resolve_options(Options(), concar.problem())
    assert hash(a) == hash(b) and a == b
