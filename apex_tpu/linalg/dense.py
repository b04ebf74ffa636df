"""Dense linear solvers on the normal equations.

The reference wraps faer's dense Cholesky/QR (src/linalg/dense/); on TPU the
MXU makes dense factorizations of the full reduced system fast up to ~20k
DOF, so these are the v1 workhorses for pose graphs (SURVEY.md §7).

Both solve the augmented system (H + lambda I) dx = -g and cache nothing
(XLA fuses/reuses); ``solve_normal`` is the undamped Gauss-Newton variant.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def solve_cholesky(H, g, damping=None):
    """Solve (H + damping*I) dx = -g via Cholesky. Returns dx."""
    D = H.shape[0]
    if damping is not None:
        H = H + damping * jnp.eye(D, dtype=H.dtype)
    cf = jax.scipy.linalg.cho_factor(H, lower=True)
    return jax.scipy.linalg.cho_solve(cf, -g)


def solve_cholesky_with_retry(H, g, damping=None, base_reg=1e-10, stages=5):
    """Cholesky solve with escalating diagonal regularization on failure,
    mirroring the reference's 5-stage retry (explicit_schur.rs:539-634).
    Failure is detected as non-finite solution entries (no exceptions under
    jit)."""
    D = H.shape[0]
    eye = jnp.eye(D, dtype=H.dtype)
    Hd = H + (damping * eye if damping is not None else 0.0)

    def attempt(reg):
        cf = jax.scipy.linalg.cho_factor(Hd + reg * eye, lower=True)
        return jax.scipy.linalg.cho_solve(cf, -g)

    dx = attempt(jnp.zeros((), dtype=H.dtype))

    def body(carry):
        dx, reg, stage = carry
        reg = jnp.where(stage == 0, base_reg * jnp.trace(Hd) / D, reg * 100.0)
        return attempt(reg), reg, stage + 1

    def cond(carry):
        dx, reg, stage = carry
        return jnp.logical_and(~jnp.all(jnp.isfinite(dx)), stage < stages)

    dx, _, _ = jax.lax.while_loop(
        cond, body, (dx, jnp.zeros((), dtype=H.dtype), jnp.zeros((), jnp.int32))
    )
    return dx


def solve_qr(r, J, damping=None):
    """Least-squares step via QR of the (optionally damped) stacked Jacobian:
    min || J dx + r ||^2 + damping ||dx||^2. Returns dx."""
    D = J.shape[1]
    if damping is not None:
        sqrt_l = jnp.sqrt(damping)
        J = jnp.concatenate([J, sqrt_l * jnp.eye(D, dtype=J.dtype)], axis=0)
        r = jnp.concatenate([r, jnp.zeros((D,), dtype=r.dtype)])
    Q, R = jnp.linalg.qr(J)
    return jax.scipy.linalg.solve_triangular(R, -(Q.T @ r), lower=False)


def covariance_from_hessian(H):
    """H^{-1} via Cholesky solve against identity (reference
    cholesky.rs:240-256)."""
    cf = jax.scipy.linalg.cho_factor(H, lower=True)
    return jax.scipy.linalg.cho_solve(cf, jnp.eye(H.shape[0], dtype=H.dtype))
