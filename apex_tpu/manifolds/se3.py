"""SE(3) — rigid transforms, storage ``[tx, ty, tz, qw, qx, qy, qz]``.

Tangent ordering is ``[rho(3), theta(3)]`` (translation first), matching the
reference apex-manifolds/src/se3.rs (log uses V^{-1}(theta) t, se3.rs:308-320;
adjoint [R, [t]x R; 0, R], se3.rs:347-369; Q-block for the right-minus
Jacobian, se3.rs:520).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from ..linalg.smallmm import es as _es

from . import so3
from .base import LieGroup
from .utils import (
    q_coeff_1,
    q_coeff_2,
    q_coeff_3,
    quat_conj,
    quat_mul,
    quat_rotate,
    quat_to_mat,
    skew,
)

DOF = 6
STORAGE_DIM = 7


def _t(x):
    return x[..., :3]


def _q(x):
    return x[..., 3:]


def _pack(t, q):
    return jnp.concatenate([t, q], axis=-1)


def identity():
    return jnp.array([0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0])


def inverse(x):
    qi = quat_conj(_q(x))
    return _pack(-quat_rotate(qi, _t(x)), qi)


def compose(a, b):
    return _pack(_t(a) + quat_rotate(_q(a), _t(b)), quat_mul(_q(a), _q(b)))


def exp(tau):
    """Exp([rho, theta]) = (V(theta) rho, Exp_SO3(theta)), V = Jl_SO3."""
    rho, theta = tau[..., :3], tau[..., 3:]
    V = so3.ljac(theta)
    t = _es("...ij,...j->...i", V, rho)
    return _pack(t, so3.exp(theta))


def log(x):
    """Log(x) = [V^{-1}(theta) t, theta]."""
    theta = so3.log(_q(x))
    Vinv = so3.ljac_inv(theta)
    rho = _es("...ij,...j->...i", Vinv, _t(x))
    return jnp.concatenate([rho, theta], axis=-1)


def adjoint(x):
    """Ad = [[R, [t]x R], [0, R]] for tangent [rho, theta]."""
    R = quat_to_mat(_q(x))
    tR = _es("...ij,...jk->...ik", skew(_t(x)), R)
    Z = jnp.zeros_like(R)
    top = jnp.concatenate([R, tR], axis=-1)
    bot = jnp.concatenate([Z, R], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def act(x, v):
    return quat_rotate(_q(x), v) + _t(x)


def act_j(x, v):
    """p' = R v + t; J_x = [R | -R [v]x] (right pert, [rho,theta]); J_v = R."""
    R = quat_to_mat(_q(x))
    p = _es("...ij,...j->...i", R, v) + _t(x)
    jx = jnp.concatenate([R, -_es("...ij,...jk->...ik", R, skew(v))], axis=-1)
    return p, jx, R


def _Q_left(rho, theta):
    """Barfoot Q matrix: the (rho, theta) off-diagonal block of Jl_SE3."""
    theta2 = jnp.sum(theta * theta, axis=-1)[..., None, None]
    P = skew(rho)
    T = skew(theta)
    TP = _es("...ij,...jk->...ik", T, P)
    PT = _es("...ij,...jk->...ik", P, T)
    TPT = _es("...ij,...jk->...ik", TP, T)
    TTP = _es("...ij,...jk->...ik", T, TP)
    PTT = _es("...ij,...jk->...ik", PT, T)
    TPTT = _es("...ij,...jk->...ik", TPT, T)
    TTPT = _es("...ij,...jk->...ik", TTP, T)
    c1 = q_coeff_1(theta2)  # (t - sin t)/t^3
    c2 = q_coeff_2(theta2)  # (t^2/2 + cos t - 1)/t^4
    c3 = q_coeff_3(theta2)  # (t - sin t - t^3/6)/t^5
    return (
        0.5 * P
        + c1 * (TP + PT + TPT)
        + c2 * (TTP + PTT - 3.0 * TPT)
        + 0.5 * (c2 + 3.0 * c3) * (TPTT + TTPT)
    )


def ljac(tau):
    """Jl_SE3 = [[Jl(theta), Q(rho,theta)], [0, Jl(theta)]]."""
    rho, theta = tau[..., :3], tau[..., 3:]
    Jl = so3.ljac(theta)
    Q = _Q_left(rho, theta)
    Z = jnp.zeros_like(Jl)
    top = jnp.concatenate([Jl, Q], axis=-1)
    bot = jnp.concatenate([Z, Jl], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def rjac(tau):
    """Jr(tau) = Jl(-tau)."""
    return ljac(-tau)


def ljac_inv(tau):
    """Jl^{-1} = [[Jl⁻¹, -Jl⁻¹ Q Jl⁻¹], [0, Jl⁻¹]]."""
    rho, theta = tau[..., :3], tau[..., 3:]
    Jli = so3.ljac_inv(theta)
    Q = _Q_left(rho, theta)
    top_right = -_es("...ik,...kl->...il", _es("...ij,...jk->...ik", Jli, Q), Jli)
    Z = jnp.zeros_like(Jli)
    top = jnp.concatenate([Jli, top_right], axis=-1)
    bot = jnp.concatenate([Z, Jli], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def rjac_inv(tau):
    return ljac_inv(-tau)


def normalize(x):
    return _pack(_t(x), so3.normalize(_q(x)))


def hat(tau):
    """4x4 se(3) matrix [[theta^, rho], [0, 0]]."""
    rho, theta = tau[..., :3], tau[..., 3:]
    top = jnp.concatenate([skew(theta), rho[..., None]], axis=-1)
    bot = jnp.zeros(top.shape[:-2] + (1, 4), dtype=tau.dtype)
    return jnp.concatenate([top, bot], axis=-2)


def random(key):
    k1, k2 = jax.random.split(key)
    return _pack(jax.random.normal(k1, (3,)), so3.random(k2))


def is_valid(x, tol=1e-6):
    return so3.is_valid(_q(x), tol) & jnp.all(jnp.isfinite(_t(x)), axis=-1)


def interpolate(a, b, alpha):
    d = log(compose(inverse(a), b))
    return compose(a, exp(alpha * d))


def from_matrix(T):
    from .utils import mat_to_quat

    return _pack(T[..., :3, 3], mat_to_quat(T[..., :3, :3]))


def to_matrix(x):
    R = quat_to_mat(_q(x))
    top = jnp.concatenate([R, _t(x)[..., None]], axis=-1)
    bot = jnp.zeros(top.shape[:-2] + (1, 4), dtype=x.dtype)
    bot = bot.at[..., 0, 3].set(1.0)
    return jnp.concatenate([top, bot], axis=-2)


SE3 = LieGroup(
    name="SE3",
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
