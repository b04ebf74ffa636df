"""SE_2(3) — extended pose (R, t, v) for IMU/VIO states.

Storage ``[tx,ty,tz, qw,qx,qy,qz, vx,vy,vz]`` (10), tangent
``[rho(3), theta(3), nu(3)]`` (9) — matching the reference apex-manifolds/
src/se23.rs (log: V^{-1} t and V^{-1} v, :293-312; adjoint
[[R, [t]xR, 0], [0, R, 0], [0, [v]xR, R]], :340-375).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from ..linalg.smallmm import es as _es

from . import so3
from .base import LieGroup
from .se3 import _Q_left
from .utils import quat_conj, quat_mul, quat_rotate, quat_to_mat, skew

DOF = 9
STORAGE_DIM = 10


def _t(x):
    return x[..., 0:3]


def _q(x):
    return x[..., 3:7]


def _v(x):
    return x[..., 7:10]


def _pack(t, q, v):
    return jnp.concatenate([t, q, v], axis=-1)


def identity():
    return jnp.concatenate([jnp.zeros(3), jnp.array([1.0, 0, 0, 0]), jnp.zeros(3)])


def inverse(x):
    qi = quat_conj(_q(x))
    return _pack(-quat_rotate(qi, _t(x)), qi, -quat_rotate(qi, _v(x)))


def compose(a, b):
    return _pack(
        _t(a) + quat_rotate(_q(a), _t(b)),
        quat_mul(_q(a), _q(b)),
        _v(a) + quat_rotate(_q(a), _v(b)),
    )


def exp(tau):
    rho, theta, nu = tau[..., 0:3], tau[..., 3:6], tau[..., 6:9]
    V = so3.ljac(theta)
    return _pack(
        _es("...ij,...j->...i", V, rho),
        so3.exp(theta),
        _es("...ij,...j->...i", V, nu),
    )


def log(x):
    theta = so3.log(_q(x))
    Vinv = so3.ljac_inv(theta)
    rho = _es("...ij,...j->...i", Vinv, _t(x))
    nu = _es("...ij,...j->...i", Vinv, _v(x))
    return jnp.concatenate([rho, theta, nu], axis=-1)


def adjoint(x):
    R = quat_to_mat(_q(x))
    tR = _es("...ij,...jk->...ik", skew(_t(x)), R)
    vR = _es("...ij,...jk->...ik", skew(_v(x)), R)
    Z = jnp.zeros_like(R)
    rows = [
        jnp.concatenate([R, tR, Z], axis=-1),
        jnp.concatenate([Z, R, Z], axis=-1),
        jnp.concatenate([Z, vR, R], axis=-1),
    ]
    return jnp.concatenate(rows, axis=-2)


def act(x, p):
    return quat_rotate(_q(x), p) + _t(x)


def _jac_blocks(tau, left: bool):
    rho, theta, nu = tau[..., 0:3], tau[..., 3:6], tau[..., 6:9]
    if left:
        J = so3.ljac(theta)
        Qr = _Q_left(rho, theta)
        Qn = _Q_left(nu, theta)
    else:
        J = so3.ljac(-theta)
        Qr = _Q_left(-rho, -theta)
        Qn = _Q_left(-nu, -theta)
    Z = jnp.zeros_like(J)
    rows = [
        jnp.concatenate([J, Qr, Z], axis=-1),
        jnp.concatenate([Z, J, Z], axis=-1),
        jnp.concatenate([Z, Qn, J], axis=-1),
    ]
    return jnp.concatenate(rows, axis=-2)


def ljac(tau):
    return _jac_blocks(tau, left=True)


def rjac(tau):
    return _jac_blocks(tau, left=False)


def _inv_blocks(J):
    """Invert the 9x9 block-triangular Jacobian using its 3x3 structure."""
    A = J[..., 0:3, 3:6]  # Q_rho block paired with diagonal D
    D = J[..., 0:3, 0:3]
    C = J[..., 6:9, 3:6]  # Q_nu
    Di = jnp.linalg.inv(D)
    Z = jnp.zeros_like(D)
    top = jnp.concatenate(
        [Di, -_es("...ik,...kl->...il", _es("...ij,...jk->...ik", Di, A), Di), Z], axis=-1
    )
    mid = jnp.concatenate([Z, Di, Z], axis=-1)
    bot = jnp.concatenate(
        [Z, -_es("...ik,...kl->...il", _es("...ij,...jk->...ik", Di, C), Di), Di], axis=-1
    )
    return jnp.concatenate([top, mid, bot], axis=-2)


def ljac_inv(tau):
    return _inv_blocks(ljac(tau))


def rjac_inv(tau):
    return _inv_blocks(rjac(tau))


def normalize(x):
    return _pack(_t(x), so3.normalize(_q(x)), _v(x))


def hat(tau):
    """5x5 matrix Lie algebra element [[theta^, rho, nu],[0,0,0],[0,0,0]]."""
    rho, theta, nu = tau[..., 0:3], tau[..., 3:6], tau[..., 6:9]
    top = jnp.concatenate([skew(theta), rho[..., None], nu[..., None]], axis=-1)
    bot = jnp.zeros(top.shape[:-2] + (2, 5), dtype=tau.dtype)
    return jnp.concatenate([top, bot], axis=-2)


def random(key):
    k1, k2, k3 = jax.random.split(key, 3)
    return _pack(jax.random.normal(k1, (3,)), so3.random(k2), jax.random.normal(k3, (3,)))


def is_valid(x, tol=1e-6):
    return so3.is_valid(_q(x), tol) & jnp.all(jnp.isfinite(x), axis=-1)


def interpolate(a, b, alpha):
    return compose(a, exp(alpha * log(compose(inverse(a), b))))


SE23 = LieGroup(
    name="SE23",
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
    rjac=rjac,
    ljac=ljac,
    rjac_inv=rjac_inv,
    ljac_inv=ljac_inv,
    hat=hat,
    random=random,
    is_valid=is_valid,
    interpolate=interpolate,
)

from . import register as _register  # noqa: E402

_register(SE23)
