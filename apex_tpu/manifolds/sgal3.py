"""SGal(3) — Galilean group (R, t, v, time) for inertial navigation.

Storage ``[tx,ty,tz, qw,qx,qy,qz, vx,vy,vz, s]`` (11), tangent
``[rho(3), nu(3), theta(3), s]`` (10) — matching the reference
apex-manifolds/src/sgal3.rs layout (log order [rho, nu, theta, s],
:322-343) and its group law

    g1 ∘ g2 = (R1 R2, R1 (t2 + s1 v2) + t1, R1 v2 + v1, s1 + s2)   (:285-319)
    g^{-1}  = (R^T, -R^T (t - s v), -R^T v, -s)                     (:272-283)
    exp     = (Exp(theta), Jl(theta) rho, Jl(theta) nu, s)          (:623-640)
    act(p)  = R p + t + s v                                         (:345-353)

The adjoint and tangent Jacobians are derived by exact autodiff of this
exp/log/compose (the reference's closed forms are approximations that are
not exactly consistent with its simplified exp).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from ..linalg.smallmm import es as _es

from . import so3
from .base import LieGroup, with_autodiff_jacobians
from .utils import quat_conj, quat_mul, quat_rotate, skew

DOF = 10
STORAGE_DIM = 11


def _t(x):
    return x[..., 0:3]


def _q(x):
    return x[..., 3:7]


def _v(x):
    return x[..., 7:10]


def _s(x):
    return x[..., 10]


def _pack(t, q, v, s):
    return jnp.concatenate([t, q, v, s[..., None]], axis=-1)


def identity():
    return jnp.concatenate(
        [jnp.zeros(3), jnp.array([1.0, 0, 0, 0]), jnp.zeros(3), jnp.zeros(1)]
    )


def inverse(x):
    qi = quat_conj(_q(x))
    ti = -quat_rotate(qi, _t(x) - _s(x)[..., None] * _v(x))
    vi = -quat_rotate(qi, _v(x))
    return _pack(ti, qi, vi, -_s(x))


def compose(a, b):
    t = quat_rotate(_q(a), _t(b) + _s(a)[..., None] * _v(b)) + _t(a)
    v = quat_rotate(_q(a), _v(b)) + _v(a)
    return _pack(t, quat_mul(_q(a), _q(b)), v, _s(a) + _s(b))


def exp(tau):
    rho, nu, theta, s = tau[..., 0:3], tau[..., 3:6], tau[..., 6:9], tau[..., 9]
    V = so3.ljac(theta)
    return _pack(
        _es("...ij,...j->...i", V, rho),
        so3.exp(theta),
        _es("...ij,...j->...i", V, nu),
        s,
    )


def log(x):
    theta = so3.log(_q(x))
    Vinv = so3.ljac_inv(theta)
    rho = _es("...ij,...j->...i", Vinv, _t(x))
    nu = _es("...ij,...j->...i", Vinv, _v(x))
    return jnp.concatenate([rho, nu, theta, _s(x)[..., None]], axis=-1)


def _adjoint_autodiff(x):
    def single(xx):
        def f(d):
            return log(compose(compose(xx, exp(d)), inverse(xx)))

        return jax.jacfwd(f)(jnp.zeros((DOF,), dtype=xx.dtype))

    flat = x.reshape((-1, STORAGE_DIM))
    out = jax.vmap(single)(flat)
    return out.reshape(x.shape[:-1] + (DOF, DOF))


def act(x, p):
    return quat_rotate(_q(x), p) + _t(x) + _s(x)[..., None] * _v(x)


def normalize(x):
    return _pack(_t(x), so3.normalize(_q(x)), _v(x), _s(x))


def hat(tau):
    """5x5 sgal(3) matrix: [[theta^, nu, rho],[0,0,s],[0,0,0]]."""
    rho, nu, theta, s = tau[..., 0:3], tau[..., 3:6], tau[..., 6:9], tau[..., 9]
    top = jnp.concatenate([skew(theta), nu[..., None], rho[..., None]], axis=-1)
    row4 = jnp.zeros(top.shape[:-2] + (1, 5), dtype=tau.dtype)
    row4 = row4.at[..., 0, 3].set(s)
    row5 = jnp.zeros(top.shape[:-2] + (1, 5), dtype=tau.dtype)
    return jnp.concatenate([top, row4, row5], axis=-2)


def random(key):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return _pack(
        jax.random.normal(k1, (3,)),
        so3.random(k2),
        jax.random.normal(k3, (3,)),
        jax.random.normal(k4, ()),
    )


def is_valid(x, tol=1e-6):
    return so3.is_valid(_q(x), tol) & jnp.all(jnp.isfinite(x), axis=-1)


def interpolate(a, b, alpha):
    return compose(a, exp(alpha * log(compose(inverse(a), b))))


SGal3 = with_autodiff_jacobians(
    LieGroup(
        name="SGal3",
        dof=DOF,
        storage_dim=STORAGE_DIM,
        identity=identity,
        inverse=inverse,
        compose=compose,
        exp=exp,
        log=log,
        adjoint=_adjoint_autodiff,
        normalize=normalize,
        act=act,
        hat=hat,
        random=random,
        is_valid=is_valid,
        interpolate=interpolate,
    )
)

from . import register as _register  # noqa: E402

_register(SGal3)
