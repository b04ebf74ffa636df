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


def _jac_third_col(rho_x, rho_y, theta, sign):
    """Third column of Jr (sign=+1) / Jl (sign=-1):
    [ (theta x - y + y cos - x sin)/theta^2,
      (x + theta y - x cos - y sin)/theta^2 ] with Taylor switch."""
    t2 = theta * theta
    eps = small_angle_threshold(theta.dtype)
    small = t2 < eps
    safe2 = jnp.where(small, jnp.ones_like(t2), t2)
    c, s = jnp.cos(theta), jnp.sin(theta)
    x = rho_x
    y = sign * rho_y  # Jl mirrors the y-coupling
    a_exact = (theta * x - y + y * c - x * s) / safe2
    b_exact = (x + theta * y - x * c - y * s) / safe2
    a_taylor = -y / 2.0 + x * theta / 6.0
    b_taylor = x / 2.0 + y * theta / 6.0
    a = jnp.where(small, a_taylor, a_exact)
    b = jnp.where(small, b_taylor, b_exact)
    return a, sign * b


def rjac(tau):
    """Closed-form right Jacobian (manif se2 convention), verified against
    exact autodiff of the exp/log pair in tests."""
    rx, ry, theta = tau[..., 0], tau[..., 1], tau[..., 2]
    A, B = _sincosc(theta)
    Bn = B  # (1-cos)/theta
    a, b = _jac_third_col(rx, ry, theta, +1.0)
    one = jnp.ones_like(theta)
    zero = jnp.zeros_like(theta)
    return jnp.stack(
        [
            jnp.stack([A, Bn, a], axis=-1),
            jnp.stack([-Bn, A, b], axis=-1),
            jnp.stack([zero, zero, one], axis=-1),
        ],
        axis=-2,
    )


def ljac(tau):
    """Left Jacobian: Jl(tau) = Jr(-tau)."""
    return rjac(-tau)


def _inv3(J):
    """Exact 3x3 inverse (adjugate) — elementwise, no matmul lowering."""
    a, b, c = J[..., 0, 0], J[..., 0, 1], J[..., 0, 2]
    d, e, f = J[..., 1, 0], J[..., 1, 1], J[..., 1, 2]
    g, h, i = J[..., 2, 0], J[..., 2, 1], J[..., 2, 2]
    det = a * (e * i - f * h) - b * (d * i - f * g) + c * (d * h - e * g)
    inv_det = 1.0 / det
    row0 = jnp.stack([e * i - f * h, c * h - b * i, b * f - c * e], axis=-1)
    row1 = jnp.stack([f * g - d * i, a * i - c * g, c * d - a * f], axis=-1)
    row2 = jnp.stack([d * h - e * g, b * g - a * h, a * e - b * d], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2) * inv_det[..., None, None]


def rjac_inv(tau):
    return _inv3(rjac(tau))


def ljac_inv(tau):
    return _inv3(ljac(tau))


def random(key):
    k1, k2 = jax.random.split(key)
    t = jax.random.normal(k1, (2,))
    th = jax.random.uniform(k2, (1,), minval=-jnp.pi, maxval=jnp.pi)
    return jnp.concatenate([t, th])


def is_valid(x, tol=1e-6):
    return jnp.all(jnp.isfinite(x), axis=-1)


def interpolate(a, b, alpha):
    return compose(a, exp(alpha * log(compose(inverse(a), b))))


SE2 = LieGroup(
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
    rjac=rjac,
    ljac=ljac,
    rjac_inv=rjac_inv,
    ljac_inv=ljac_inv,
    hat=hat,
    random=random,
    is_valid=is_valid,
    interpolate=interpolate,
)
