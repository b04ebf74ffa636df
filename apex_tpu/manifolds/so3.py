"""SO(3) — 3D rotations stored as w-first Hamilton unit quaternions.

Mirrors the semantics of the reference apex-manifolds/src/so3.rs (storage,
exp/log, right/left Jacobians with the 1e-10 theta^2 Taylor switch), written
batched-native for TPU: every function broadcasts over leading batch dims.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from ..linalg.smallmm import es as _es

from ..config import small_angle_threshold
from .base import LieGroup
from .utils import (
    cosc_b,
    jlinv_d,
    quat_conj,
    quat_mul,
    quat_normalize,
    quat_rotate,
    quat_to_mat,
    sinc3_c,
    sinc_a,
    skew,
)

DOF = 3
STORAGE_DIM = 4


def identity():
    return jnp.array([1.0, 0.0, 0.0, 0.0])


def inverse(q):
    return quat_conj(q)


def compose(q1, q2):
    return quat_mul(q1, q2)


def exp(theta):
    """Exp: (..., 3) axis-angle -> unit quaternion (..., 4)."""
    theta2 = jnp.sum(theta * theta, axis=-1)
    eps = small_angle_threshold(theta.dtype)
    small = theta2 < eps
    safe = jnp.sqrt(jnp.where(small, jnp.ones_like(theta2), theta2))
    half = 0.5 * safe
    # sin(t/2)/t, with Taylor 1/2 - t^2/48 for small t
    k = jnp.where(small, 0.5 - theta2 / 48.0, jnp.sin(half) / safe)
    w = jnp.where(small, 1.0 - theta2 / 8.0, jnp.cos(half))
    return jnp.concatenate([w[..., None], k[..., None] * theta], axis=-1)


def log(q):
    """Log: unit quaternion -> axis-angle (..., 3), principal (|theta| <= pi)."""
    # Canonicalize sign so w >= 0 => angle in [0, pi].
    q = jnp.where(q[..., :1] < 0, -q, q)
    w = q[..., 0]
    v = q[..., 1:]
    vn2 = jnp.sum(v * v, axis=-1)
    eps = small_angle_threshold(q.dtype)
    small = vn2 < eps * 0.25  # |v| = sin(t/2) ~ t/2, so vn2 ~ t^2/4
    vn = jnp.sqrt(jnp.where(small, jnp.ones_like(vn2), vn2))
    angle = 2.0 * jnp.arctan2(vn, w)
    k_exact = angle / vn
    # small: theta = 2 v / w * (1 - |v|^2/(3 w^2))
    safe_w = jnp.where(jnp.abs(w) < 1e-30, jnp.ones_like(w), w)
    k_taylor = (2.0 / safe_w) * (1.0 - vn2 / (3.0 * safe_w * safe_w))
    k = jnp.where(small, k_taylor, k_exact)
    return k[..., None] * v


def to_matrix(q):
    return quat_to_mat(q)


def act(q, v):
    return quat_rotate(q, v)


def act_j(q, v):
    """p' = R v; J_q (right pert) = -R [v]x, J_v = R."""
    R = quat_to_mat(q)
    p = _es("...ij,...j->...i", R, v)
    return p, -_es("...ij,...jk->...ik", R, skew(v)), R


def adjoint(q):
    return quat_to_mat(q)


def rjac(theta):
    """Right Jacobian: I - B(t)[t]x + C(t)[t]x^2."""
    theta2 = jnp.sum(theta * theta, axis=-1)[..., None, None]
    S = skew(theta)
    S2 = _es("...ij,...jk->...ik", S, S)
    eye = jnp.eye(3, dtype=theta.dtype)
    return eye - cosc_b(theta2) * S + sinc3_c(theta2) * S2


def ljac(theta):
    """Left Jacobian: I + B(t)[t]x + C(t)[t]x^2."""
    theta2 = jnp.sum(theta * theta, axis=-1)[..., None, None]
    S = skew(theta)
    S2 = _es("...ij,...jk->...ik", S, S)
    eye = jnp.eye(3, dtype=theta.dtype)
    return eye + cosc_b(theta2) * S + sinc3_c(theta2) * S2


def rjac_inv(theta):
    """Jr^{-1} = I + 1/2 [t]x + D(t) [t]x^2."""
    theta2 = jnp.sum(theta * theta, axis=-1)[..., None, None]
    S = skew(theta)
    S2 = _es("...ij,...jk->...ik", S, S)
    eye = jnp.eye(3, dtype=theta.dtype)
    return eye + 0.5 * S + jlinv_d(theta2) * S2


def ljac_inv(theta):
    """Jl^{-1} = I - 1/2 [t]x + D(t) [t]x^2."""
    theta2 = jnp.sum(theta * theta, axis=-1)[..., None, None]
    S = skew(theta)
    S2 = _es("...ij,...jk->...ik", S, S)
    eye = jnp.eye(3, dtype=theta.dtype)
    return eye - 0.5 * S + jlinv_d(theta2) * S2


def normalize(q):
    q = quat_normalize(q)
    return jnp.where(q[..., :1] < 0, -q, q)


def hat(theta):
    return skew(theta)


def random(key):
    # Uniform random rotation via normalized Gaussian quaternion.
    q = jax.random.normal(key, (4,))
    return normalize(q)


def is_valid(q, tol=1e-6):
    return jnp.abs(jnp.sum(q * q, axis=-1) - 1.0) < tol


def interpolate(q1, q2, alpha):
    """Geodesic slerp via x ⊞ (alpha * (y ⊟ x))."""
    d = log(compose(inverse(q1), q2))
    return compose(q1, exp(alpha * d))


# A/B coefficient re-exports used by SE3.
__all__ = ["SO3", "exp", "log", "rjac", "ljac", "rjac_inv", "ljac_inv", "sinc_a"]


SO3 = LieGroup(
    name="SO3",
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
