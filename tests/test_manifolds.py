"""Manifold invariants + analytic-vs-numeric Jacobian sweeps.

Mirrors the reference test strategy (SURVEY.md §4: identity, compose∘inverse,
exp/log round-trip, numeric Jacobian verification against analytic).

Numeric Jacobians are central differences in the right-perturbation sense:
    J[:, i] ≈ (f(x ⊞ eps·e_i) ⊟ f(x ⊟' eps·e_i)) / (2 eps)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from apex_tpu import manifolds

EPS = 1e-6
# Central-difference truncation error on the strongly nonlinear groups
# (Sim3's scale-coupled V matrix) reaches ~1.3e-6; the analytic Jacobians
# themselves match exact autodiff to <1e-15 (see test_*_vs_autodiff).
TOL = 5e-6

GROUPS = [
    manifolds.SO2,
    manifolds.SO3,
    manifolds.SE2,
    manifolds.SE3,
    manifolds.get("SE23"),
    manifolds.get("Sim3"),
    manifolds.get("SGal3"),
    manifolds.Rn(3),
    manifolds.Rn(5),
]


def group_ids(g):
    return g.name


def numeric_jacobian(G, f, x, out_group=None):
    """d f(x ⊞ d) ⊟ f(x) / d d at d=0, central differences. f: storage->storage
    of out_group (default G)."""
    Gout = out_group or G
    fx0 = f(x)

    cols = []
    for i in range(G.dof):
        e = np.zeros(G.dof)
        e[i] = EPS
        e = jnp.asarray(e)
        fp = f(G.plus(x, e))
        fm = f(G.plus(x, -e))
        col = Gout.minus(fp, fm) / (2 * EPS)
        cols.append(np.asarray(col))
    return np.stack(cols, axis=-1)


def rand_elems(G, n, seed=0):
    key = jax.random.PRNGKey(seed)
    return [G.random(k) for k in jax.random.split(key, n)]


@pytest.mark.parametrize("G", GROUPS, ids=group_ids)
def test_identity_and_inverse(G):
    for x in rand_elems(G, 4):
        e = G.identity().astype(x.dtype)
        np.testing.assert_allclose(
            np.asarray(G.minus(G.compose(x, G.inverse(x)), e)), 0.0, atol=1e-9
        )
        np.testing.assert_allclose(
            np.asarray(G.minus(G.compose(G.inverse(x), x), e)), 0.0, atol=1e-9
        )
        np.testing.assert_allclose(np.asarray(G.minus(G.compose(x, e), x)), 0.0, atol=1e-9)


@pytest.mark.parametrize("G", GROUPS, ids=group_ids)
def test_exp_log_roundtrip(G):
    key = jax.random.PRNGKey(3)
    for k in jax.random.split(key, 4):
        tau = 0.7 * jax.random.normal(k, (G.dof,))
        np.testing.assert_allclose(
            np.asarray(G.log(G.exp(tau))), np.asarray(tau), atol=1e-9
        )
    for x in rand_elems(G, 4, seed=5):
        y = G.exp(G.log(x))
        np.testing.assert_allclose(np.asarray(G.minus(y, x)), 0.0, atol=1e-9)


@pytest.mark.parametrize("G", GROUPS, ids=group_ids)
def test_compose_jacobians(G):
    a, b = rand_elems(G, 2, seed=7)
    _, ja, jb = G.compose_j(a, b)
    ja_num = numeric_jacobian(G, lambda x: G.compose(x, b), a)
    jb_num = numeric_jacobian(G, lambda x: G.compose(a, x), b)
    np.testing.assert_allclose(np.asarray(ja), ja_num, atol=TOL)
    np.testing.assert_allclose(np.asarray(jb), jb_num, atol=TOL)


@pytest.mark.parametrize("G", GROUPS, ids=group_ids)
def test_inverse_jacobian(G):
    (a,) = rand_elems(G, 1, seed=11)
    _, j = G.inverse_j(a)
    j_num = numeric_jacobian(G, G.inverse, a)
    np.testing.assert_allclose(np.asarray(j), j_num, atol=TOL)


@pytest.mark.parametrize("G", GROUPS, ids=group_ids)
def test_between_jacobians(G):
    a, b = rand_elems(G, 2, seed=13)
    _, ja, jb = G.between_j(a, b)
    ja_num = numeric_jacobian(G, lambda x: G.between(x, b), a)
    jb_num = numeric_jacobian(G, lambda x: G.between(a, x), b)
    np.testing.assert_allclose(np.asarray(ja), ja_num, atol=TOL)
    np.testing.assert_allclose(np.asarray(jb), jb_num, atol=TOL)


@pytest.mark.parametrize("G", GROUPS, ids=group_ids)
def test_log_jacobian(G):
    (a,) = rand_elems(G, 1, seed=17)

    # J of tau = Log(a ⊞ d) w.r.t. d, against Rn numeric diff on tangent output
    t, j = G.log_j(a)
    Rd = manifolds.Rn(G.dof)
    j_num = numeric_jacobian(G, G.log, a, out_group=Rd)
    np.testing.assert_allclose(np.asarray(j), j_num, atol=TOL)


@pytest.mark.parametrize("G", GROUPS, ids=group_ids)
def test_exp_jacobian(G):
    key = jax.random.PRNGKey(19)
    tau = 0.6 * jax.random.normal(key, (G.dof,))
    _, j = G.exp_j(tau)
    # numeric: Exp(tau + eps e_i) ⊟ Exp(tau - eps e_i)
    cols = []
    for i in range(G.dof):
        e = np.zeros(G.dof)
        e[i] = EPS
        e = jnp.asarray(e)
        col = G.minus(G.exp(tau + e), G.exp(tau - e)) / (2 * EPS)
        cols.append(np.asarray(col))
    np.testing.assert_allclose(np.asarray(j), np.stack(cols, -1), atol=TOL)


@pytest.mark.parametrize("G", GROUPS, ids=group_ids)
def test_plus_minus_jacobians(G):
    a, b = rand_elems(G, 2, seed=23)
    key = jax.random.PRNGKey(29)
    tau = 0.4 * jax.random.normal(key, (G.dof,))

    _, jx, jt = G.plus_j(a, tau)
    jx_num = numeric_jacobian(G, lambda x: G.plus(x, tau), a)
    np.testing.assert_allclose(np.asarray(jx), jx_num, atol=TOL)
    cols = []
    for i in range(G.dof):
        e = np.zeros(G.dof)
        e[i] = EPS
        e = jnp.asarray(e)
        col = G.minus(G.plus(a, tau + e), G.plus(a, tau - e)) / (2 * EPS)
        cols.append(np.asarray(col))
    np.testing.assert_allclose(np.asarray(jt), np.stack(cols, -1), atol=TOL)

    Rd = manifolds.Rn(G.dof)
    _, jx2, jy2 = G.minus_j(a, b)
    jx2_num = numeric_jacobian(G, lambda x: G.minus(x, b), a, out_group=Rd)
    jy2_num = numeric_jacobian(G, lambda y: G.minus(a, y), b, out_group=Rd)
    np.testing.assert_allclose(np.asarray(jx2), jx2_num, atol=TOL)
    np.testing.assert_allclose(np.asarray(jy2), jy2_num, atol=TOL)


@pytest.mark.parametrize("G", GROUPS, ids=group_ids)
def test_adjoint_identity(G):
    """Ad(g) Log(h) == Log(g h g^-1) for small h.

    For groups whose Exp is a true exponential this is exact at finite tau;
    SGal3 uses the reference's simplified exp (sgal3.rs:623-640 — no
    velocity-time coupling term), so the identity holds only to first order
    and is checked at small tau.
    """
    (g,) = rand_elems(G, 1, seed=31)
    key = jax.random.PRNGKey(37)
    scale, atol = (0.1, 1e-8) if G.name != "SGal3" else (1e-4, 1e-8)
    tau = scale * jax.random.normal(key, (G.dof,))
    lhs = G.adjoint(g) @ tau
    rhs = G.log(G.compose(G.compose(g, G.exp(tau)), G.inverse(g)))
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), atol=atol)


@pytest.mark.parametrize("G", GROUPS, ids=group_ids)
def test_derived_jacobians_vs_autodiff(G):
    """compose/inverse Jacobians match exact forward-mode autodiff of the
    plus/minus retraction (machine precision — stronger than the
    finite-difference checks above)."""
    a, b = rand_elems(G, 2, seed=77)
    zero = jnp.zeros((G.dof,))

    _, ja, jb = G.compose_j(a, b)
    ja_auto = jax.jacfwd(lambda d: G.minus(G.compose(G.plus(a, d), b), G.compose(a, b)))(zero)
    jb_auto = jax.jacfwd(lambda d: G.minus(G.compose(a, G.plus(b, d)), G.compose(a, b)))(zero)
    np.testing.assert_allclose(np.asarray(ja), np.asarray(ja_auto), atol=1e-9)
    np.testing.assert_allclose(np.asarray(jb), np.asarray(jb_auto), atol=1e-9)

    _, ji = G.inverse_j(a)
    ji_auto = jax.jacfwd(lambda d: G.minus(G.inverse(G.plus(a, d)), G.inverse(a)))(zero)
    np.testing.assert_allclose(np.asarray(ji), np.asarray(ji_auto), atol=1e-9)


@pytest.mark.parametrize("G", GROUPS, ids=group_ids)
def test_jac_inverses_consistent(G):
    key = jax.random.PRNGKey(41)
    tau = 0.5 * jax.random.normal(key, (G.dof,))
    eye = np.eye(G.dof)
    np.testing.assert_allclose(np.asarray(G.rjac(tau) @ G.rjac_inv(tau)), eye, atol=1e-9)
    np.testing.assert_allclose(np.asarray(G.ljac(tau) @ G.ljac_inv(tau)), eye, atol=1e-9)


@pytest.mark.parametrize("G", GROUPS, ids=group_ids)
def test_small_angle_stability(G):
    """Exp/Log and Jacobians must be finite and accurate near zero."""
    for scale in [0.0, 1e-12, 1e-8, 1e-6]:
        tau = jnp.full((G.dof,), scale)
        x = G.exp(tau)
        assert np.all(np.isfinite(np.asarray(x)))
        np.testing.assert_allclose(np.asarray(G.log(x)), np.asarray(tau), atol=1e-9)
        assert np.all(np.isfinite(np.asarray(G.rjac(tau))))
        assert np.all(np.isfinite(np.asarray(G.rjac_inv(tau))))


@pytest.mark.parametrize("G", GROUPS, ids=group_ids)
def test_batched_matches_single(G):
    """Batched-native ops agree with per-element application."""
    xs = jnp.stack(rand_elems(G, 6, seed=43))
    ys = jnp.stack(rand_elems(G, 6, seed=47))
    batched = G.compose(xs, ys)
    single = jnp.stack([G.compose(xs[i], ys[i]) for i in range(6)])
    np.testing.assert_allclose(np.asarray(batched), np.asarray(single), atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(G.log(xs)), np.asarray(jnp.stack([G.log(xs[i]) for i in range(6)])),
        atol=1e-12,
    )


def test_se3_act_jacobians():
    from apex_tpu.manifolds import se3 as se3m

    key = jax.random.PRNGKey(53)
    x = manifolds.SE3.random(key)
    v = jax.random.normal(jax.random.PRNGKey(59), (3,))
    p, jx, jv = se3m.act_j(x, v)
    np.testing.assert_allclose(np.asarray(p), np.asarray(manifolds.SE3.act(x, v)), atol=1e-12)

    cols = []
    for i in range(6):
        e = np.zeros(6)
        e[i] = EPS
        e = jnp.asarray(e)
        col = (manifolds.SE3.act(manifolds.SE3.plus(x, e), v)
               - manifolds.SE3.act(manifolds.SE3.plus(x, -e), v)) / (2 * EPS)
        cols.append(np.asarray(col))
    np.testing.assert_allclose(np.asarray(jx), np.stack(cols, -1), atol=TOL)
    jv_num = np.stack(
        [
            np.asarray(
                (manifolds.SE3.act(x, v + jnp.eye(3)[i] * EPS)
                 - manifolds.SE3.act(x, v - jnp.eye(3)[i] * EPS)) / (2 * EPS)
            )
            for i in range(3)
        ],
        axis=-1,
    )
    np.testing.assert_allclose(np.asarray(jv), jv_num, atol=TOL)


def test_interpolation():
    for G in GROUPS:
        a, b = rand_elems(G, 2, seed=61)
        np.testing.assert_allclose(np.asarray(G.minus(G.interpolate(a, b, 0.0), a)), 0.0, atol=1e-9)
        np.testing.assert_allclose(np.asarray(G.minus(G.interpolate(a, b, 1.0), b)), 0.0, atol=1e-9)
