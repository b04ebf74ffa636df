"""SE(2) — planar rigid transforms, storage ``[x, y, theta]``.

Tangent ordering ``[rho_x, rho_y, theta]``; conventions follow manif and the
reference apex-manifolds/src/se2.rs. Exp uses the closed-form V(theta),
adjoint is [[R, -S t], [0, 1]] with S = [[0,-1],[1,0]].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import small_angle_threshold
from .base import LieGroup
from .utils import wrap_angle

DOF = 3
STORAGE_DIM = 3


def _rot(theta):
    c, s = jnp.cos(theta), jnp.sin(theta)
    return jnp.stack(
        [jnp.stack([c, -s], axis=-1), jnp.stack([s, c], axis=-1)], axis=-2
    )


def _sincosc(theta):
    """Return A = sin(t)/t and B = (1-cos(t))/t, NaN-safe at 0."""
    t2 = theta * theta
    eps = small_angle_threshold(theta.dtype)
    small = t2 < eps
    safe = jnp.where(small, jnp.ones_like(theta), theta)
    A = jnp.where(small, 1.0 - t2 / 6.0, jnp.sin(safe) / safe)
    B = jnp.where(small, theta / 2.0 - t2 * theta / 24.0, (1.0 - jnp.cos(safe)) / safe)
    return A, B


def identity():
    return jnp.zeros((3,))


def inverse(x):
    theta = x[..., 2]
    c, s = jnp.cos(theta), jnp.sin(theta)
    tx, ty = x[..., 0], x[..., 1]
    # -R^T t
    nx = -(c * tx + s * ty)
    ny = -(-s * tx + c * ty)
    return jnp.stack([nx, ny, -theta], axis=-1)


def compose(a, b):
    theta = a[..., 2]
    c, s = jnp.cos(theta), jnp.sin(theta)
    bx, by = b[..., 0], b[..., 1]
    return jnp.stack(
        [
            a[..., 0] + c * bx - s * by,
            a[..., 1] + s * bx + c * by,
            wrap_angle(theta + b[..., 2]),
        ],
        axis=-1,
    )


def exp(tau):
    """Exp([rho, theta]) = (V(theta) rho, theta) with V = [[A, -B], [B, A]]."""
    rx, ry, theta = tau[..., 0], tau[..., 1], tau[..., 2]
    A, B = _sincosc(theta)
    return jnp.stack([A * rx - B * ry, B * rx + A * ry, wrap_angle(theta)], axis=-1)


def log(x):
    """Log: rho = V(theta)^{-1} t."""
    theta = wrap_angle(x[..., 2])
    A, B = _sincosc(theta)
    den = A * A + B * B
    tx, ty = x[..., 0], x[..., 1]
    rx = (A * tx + B * ty) / den
    ry = (-B * tx + A * ty) / den
    return jnp.stack([rx, ry, theta], axis=-1)


def adjoint(x):
    """Ad = [[R, -S t], [0, 1]], S = [[0,-1],[1,0]] => -S t = [ty, -tx]."""
    theta = x[..., 2]
    c, s = jnp.cos(theta), jnp.sin(theta)
    tx, ty = x[..., 0], x[..., 1]
    one = jnp.ones_like(c)
    zero = jnp.zeros_like(c)
    return jnp.stack(
        [
            jnp.stack([c, -s, ty], axis=-1),
            jnp.stack([s, c, -tx], axis=-1),
            jnp.stack([zero, zero, one], axis=-1),
        ],
        axis=-2,
    )


def act(x, v):
    theta = x[..., 2]
    c, s = jnp.cos(theta), jnp.sin(theta)
    vx, vy = v[..., 0], v[..., 1]
    return jnp.stack(
        [x[..., 0] + c * vx - s * vy, x[..., 1] + s * vx + c * vy], axis=-1
    )


def normalize(x):
    return x.at[..., 2].set(wrap_angle(x[..., 2]))


def hat(tau):
    rx, ry, theta = tau[..., 0], tau[..., 1], tau[..., 2]
    z = jnp.zeros_like(theta)
    return jnp.stack(
        [
            jnp.stack([z, -theta, rx], axis=-1),
            jnp.stack([theta, z, ry], axis=-1),
            jnp.stack([z, z, z], axis=-1),
        ],
        axis=-2,
    )


def random(key):
    k1, k2 = jax.random.split(key)
    t = jax.random.normal(k1, (2,))
    th = jax.random.uniform(k2, (1,), minval=-jnp.pi, maxval=jnp.pi)
    return jnp.concatenate([t, th])


def is_valid(x, tol=1e-6):
    return jnp.all(jnp.isfinite(x), axis=-1)


def interpolate(a, b, alpha):
    return compose(a, exp(alpha * log(compose(inverse(a), b))))


from .base import with_autodiff_jacobians as _wad  # noqa: E402

SE2 = _wad(
    LieGroup(
        name="SE2",
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
