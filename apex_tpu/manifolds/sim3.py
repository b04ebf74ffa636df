"""Sim(3) — similarity transforms (sR, t).

Storage ``[tx,ty,tz, qw,qx,qy,qz, s]`` (8), tangent ``[rho(3), theta(3),
sigma]`` (7) — matching the reference apex-manifolds/src/sim3.rs:
exp uses the scale-aware V(theta, sigma) matrix (:506-546), log its inverse,
act is s·R·x + t, adjoint [[sR, [t]x sR, 0],[0,R,0],[0,0,1]] (:329-358).

Tangent Jacobians come from exact autodiff of the group's own exp/log
(base.with_autodiff_jacobians) — consistent by construction with the
retraction, which the reference's hand-written Q-matrix approximation is
not guaranteed to be.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from ..linalg.smallmm import es as _es

from . import so3
from .base import LieGroup, with_autodiff_jacobians
from ..config import small_angle_threshold
from .utils import quat_conj, quat_mul, quat_rotate, quat_to_mat, skew

DOF = 7
STORAGE_DIM = 8


def _t(x):
    return x[..., 0:3]


def _q(x):
    return x[..., 3:7]


def _s(x):
    return x[..., 7]


def _pack(t, q, s):
    return jnp.concatenate([t, q, s[..., None]], axis=-1)


def identity():
    return jnp.concatenate([jnp.zeros(3), jnp.array([1.0, 0, 0, 0]), jnp.ones(1)])


def inverse(x):
    qi = quat_conj(_q(x))
    si = 1.0 / _s(x)
    ti = -si[..., None] * quat_rotate(qi, _t(x))
    return _pack(ti, qi, si)


def compose(a, b):
    # (s1 R1, t1) (s2 R2, t2) = (s1 s2 R1 R2, s1 R1 t2 + t1)
    return _pack(
        _s(a)[..., None] * quat_rotate(_q(a), _t(b)) + _t(a),
        quat_mul(_q(a), _q(b)),
        _s(a) * _s(b),
    )


def _v_matrix(theta, sigma):
    """Scale-aware V(theta, sigma) (reference sim3.rs:506-546), NaN-safe
    across all four regimes via nested where."""
    eps = small_angle_threshold(theta.dtype)
    t2 = jnp.sum(theta * theta, axis=-1)
    th = skew(theta)
    th2 = _es("...ij,...jk->...ik", th, th)
    eye = jnp.eye(3, dtype=theta.dtype)

    small_t = t2 < eps
    small_s = jnp.abs(sigma) < eps
    tn = jnp.sqrt(jnp.where(small_t, jnp.ones_like(t2), t2))
    sin_t, cos_t = jnp.sin(tn), jnp.cos(tn)
    safe_sigma = jnp.where(small_s, jnp.ones_like(sigma), sigma)
    e_sig = jnp.exp(sigma)

    # Case both small: I (+ first-order sigma correction for smoothness)
    V_both = eye * (1.0 + sigma / 2.0)[..., None, None]

    # Pure scale: (e^sigma - 1)/sigma * I
    a_scale = jnp.where(small_s, 1.0 + sigma / 2.0, (e_sig - 1.0) / safe_sigma)
    V_scale = a_scale[..., None, None] * eye

    # Pure rotation: SO(3) left Jacobian
    b_rot = jnp.where(small_t, 0.5 - t2 / 24.0, (1.0 - cos_t) / jnp.where(small_t, 1.0, t2))
    c_rot = jnp.where(
        small_t, 1.0 / 6.0 - t2 / 120.0, (tn - sin_t) / jnp.where(small_t, 1.0, tn * t2)
    )
    V_rot = eye + b_rot[..., None, None] * th + c_rot[..., None, None] * th2

    # General case
    alpha2 = sigma * sigma + t2
    safe_a2 = jnp.where(alpha2 < 1e-300, jnp.ones_like(alpha2), alpha2)
    a_g = (e_sig - 1.0) / safe_sigma
    b_g = (e_sig * (sigma * sin_t - tn * cos_t) + tn) / (jnp.where(small_t, 1.0, tn) * safe_a2)
    cos_int = (e_sig * (sigma * cos_t + tn * sin_t) - sigma) / safe_a2
    c_g = (a_g - cos_int) / jnp.where(small_t, 1.0, t2)
    V_gen = a_g[..., None, None] * eye + b_g[..., None, None] * th + c_g[..., None, None] * th2

    V = jnp.where(
        (small_t & small_s)[..., None, None],
        V_both,
        jnp.where(
            small_t[..., None, None],
            V_scale,
            jnp.where(small_s[..., None, None], V_rot, V_gen),
        ),
    )
    return V


def exp(tau):
    rho, theta, sigma = tau[..., 0:3], tau[..., 3:6], tau[..., 6]
    V = _v_matrix(theta, sigma)
    return _pack(
        _es("...ij,...j->...i", V, rho), so3.exp(theta), jnp.exp(sigma)
    )


def log(x):
    theta = so3.log(_q(x))
    sigma = jnp.log(_s(x))
    Vinv = jnp.linalg.inv(_v_matrix(theta, sigma))
    rho = _es("...ij,...j->...i", Vinv, _t(x))
    return jnp.concatenate([rho, theta, sigma[..., None]], axis=-1)


def adjoint(x):
    """True Sim(3) adjoint for tangent [rho, theta, sigma]:
    [[sR, [t]x R, -t], [0, R, 0], [0, 0, 1]] (Strasdat convention).

    Note: the reference (sim3.rs:329-358) writes [[sR, [t]x sR, 0], ...],
    which is inconsistent with its own exp map (wrong scale on the coupling
    block, missing -t column); we use the exact form so the generic derived
    Jacobians (compose/between/inverse) match numeric differentiation.
    """
    R = quat_to_mat(_q(x))
    sR = _s(x)[..., None, None] * R
    tR = _es("...ij,...jk->...ik", skew(_t(x)), R)
    Z3 = jnp.zeros_like(R)
    mt = -_t(x)[..., None]
    z31 = jnp.zeros(R.shape[:-2] + (3, 1), dtype=x.dtype)
    one = jnp.ones(R.shape[:-2] + (1, 1), dtype=x.dtype)
    z13 = jnp.zeros(R.shape[:-2] + (1, 3), dtype=x.dtype)
    top = jnp.concatenate([sR, tR, mt], axis=-1)
    mid = jnp.concatenate([Z3, R, z31], axis=-1)
    bot = jnp.concatenate([z13, z13, one], axis=-1)
    return jnp.concatenate([top, mid, bot], axis=-2)


def act(x, p):
    return _s(x)[..., None] * quat_rotate(_q(x), p) + _t(x)


def normalize(x):
    return _pack(_t(x), so3.normalize(_q(x)), jnp.abs(_s(x)))


def hat(tau):
    rho, theta, sigma = tau[..., 0:3], tau[..., 3:6], tau[..., 6]
    top = jnp.concatenate(
        [skew(theta) + sigma[..., None, None] * jnp.eye(3, dtype=tau.dtype), rho[..., None]],
        axis=-1,
    )
    bot = jnp.zeros(top.shape[:-2] + (1, 4), dtype=tau.dtype)
    return jnp.concatenate([top, bot], axis=-2)


def random(key):
    k1, k2, k3 = jax.random.split(key, 3)
    s = jnp.exp(0.5 * jax.random.normal(k3, (1,)))
    return jnp.concatenate([jax.random.normal(k1, (3,)), so3.random(k2), s])


def is_valid(x, tol=1e-6):
    return so3.is_valid(_q(x), tol) & (_s(x) > 0) & jnp.all(jnp.isfinite(x), axis=-1)


def interpolate(a, b, alpha):
    return compose(a, exp(alpha * log(compose(inverse(a), b))))


Sim3 = with_autodiff_jacobians(
    LieGroup(
        name="Sim3",
        dof=DOF,
        storage_dim=STORAGE_DIM,
        identity=identity,
        inverse=inverse,
        compose=compose,
        exp=exp,
        log=log,
        adjoint=adjoint,
        normalize=normalize,
        act=act,
        hat=hat,
        random=random,
        is_valid=is_valid,
        interpolate=interpolate,
    )
)

from . import register as _register  # noqa: E402

_register(Sim3)
