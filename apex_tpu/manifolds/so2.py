"""SO(2) — planar rotations, storage ``[theta]`` (1 parameter, 1 DOF).

The reference (apex-manifolds/src/so2.rs) stores a unit complex number
internally but exposes the ``[angle]`` DVector format at the factor boundary
(src/factors/between_factor.rs:190); we use the angle directly and wrap to
(-pi, pi] on composition, which keeps log exact.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .base import LieGroup
from .utils import wrap_angle

DOF = 1
STORAGE_DIM = 1


def identity():
    return jnp.zeros((1,))


def inverse(x):
    return -x


def compose(a, b):
    return wrap_angle(a + b)


def exp(theta):
    return wrap_angle(theta)


def log(x):
    return wrap_angle(x)


def adjoint(x):
    return jnp.ones(x.shape[:-1] + (1, 1), dtype=x.dtype)


def _eye1(x):
    return jnp.ones(x.shape[:-1] + (1, 1), dtype=x.dtype)


def act(x, v):
    """Rotate 2D vector(s)."""
    c, s = jnp.cos(x[..., 0]), jnp.sin(x[..., 0])
    vx, vy = v[..., 0], v[..., 1]
    return jnp.stack([c * vx - s * vy, s * vx + c * vy], axis=-1)


def normalize(x):
    return wrap_angle(x)


def hat(theta):
    t = theta[..., 0]
    z = jnp.zeros_like(t)
    return jnp.stack(
        [jnp.stack([z, -t], axis=-1), jnp.stack([t, z], axis=-1)], axis=-2
    )


def random(key):
    return jax.random.uniform(key, (1,), minval=-jnp.pi, maxval=jnp.pi)


def is_valid(x, tol=1e-6):
    return jnp.all(jnp.isfinite(x), axis=-1)


def interpolate(a, b, alpha):
    return compose(a, exp(alpha * log(compose(inverse(a), b))))


SO2 = LieGroup(
    name="SO2",
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
    rjac=_eye1,
    ljac=_eye1,
    rjac_inv=_eye1,
    ljac_inv=_eye1,
    hat=hat,
    random=random,
    is_valid=is_valid,
    interpolate=interpolate,
)
