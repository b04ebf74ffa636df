"""R^n — Euclidean vector space as a (trivial) Lie group.

The reference (apex-manifolds/src/rn.rs) uses a dynamic-dimension DVector
with a ``DIM=0`` sentinel; here :func:`Rn` is a factory producing a fixed-n
:class:`LieGroup` instance (fixed shapes are required for XLA anyway).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .base import LieGroup


@functools.lru_cache(maxsize=None)
def Rn(n: int) -> LieGroup:
    def identity():
        return jnp.zeros((n,))

    def inverse(x):
        return -x

    def compose(a, b):
        return a + b

    def _eye(x):
        eye = jnp.eye(n, dtype=x.dtype)
        return jnp.broadcast_to(eye, x.shape[:-1] + (n, n))

    def act(x, v):
        return x + v

    def hat(t):
        return t

    def random(key):
        return jax.random.normal(key, (n,))

    def is_valid(x, tol=1e-6):
        return jnp.all(jnp.isfinite(x), axis=-1)

    def interpolate(a, b, alpha):
        return a + alpha * (b - a)

    return LieGroup(
        name=f"R{n}",
        dof=n,
        storage_dim=n,
        identity=identity,
        inverse=inverse,
        compose=compose,
        exp=lambda t: t,
        log=lambda x: x,
        adjoint=_eye,
        normalize=lambda x: x,
        act=act,
        rjac=_eye,
        ljac=_eye,
        rjac_inv=_eye,
        ljac_inv=_eye,
        hat=hat,
        random=random,
        is_valid=is_valid,
        interpolate=interpolate,
    )
