"""Ceres-style corrector: rescale residuals and rank-1-correct Jacobians so
the robustified problem becomes reweighted least squares.

Matches the reference src/core/corrector.rs:106-181 (which follows Ceres
corrector.cc):

    s          = ||r||^2
    sqrt_rho1  = sqrt(rho'(s))
    if s == 0 or rho'' <= 0:
        residual_scaling = sqrt_rho1;  alpha/s term = 0
    else:
        alpha = 1 - sqrt(max(1 + 2 s rho''/rho', 0))
        residual_scaling = sqrt_rho1 / (1 - alpha)
        alpha_sq_norm    = alpha / s

    r_tilde = residual_scaling * r
    J_tilde = sqrt_rho1 * (J - alpha_sq_norm * r r^T J)

All functions are batched: ``r`` has shape (..., d), ``J`` (..., d, n).
"""

from __future__ import annotations

import jax.numpy as jnp
from ..linalg.smallmm import es as _es

from .losses import evaluate


def corrector_coefficients(kind: str, params, s):
    """Return (sqrt_rho1, residual_scaling, alpha_sq_norm), elementwise in s."""
    _, rho1, rho2 = evaluate(kind, params, s)
    sqrt_rho1 = jnp.sqrt(rho1)
    trivial = (s == 0.0) | (rho2 <= 0.0)
    safe_s = jnp.where(s == 0.0, jnp.ones_like(s), s)
    safe_rho1 = jnp.where(rho1 == 0.0, jnp.ones_like(rho1), rho1)
    d = jnp.maximum(1.0 + 2.0 * s * rho2 / safe_rho1, 0.0)
    alpha = 1.0 - jnp.sqrt(d)
    residual_scaling = jnp.where(trivial, sqrt_rho1, sqrt_rho1 / (1.0 - alpha))
    alpha_sq_norm = jnp.where(trivial, jnp.zeros_like(s), alpha / safe_s)
    return sqrt_rho1, residual_scaling, alpha_sq_norm


def correct(kind: str, params, r, J=None):
    """Apply the corrector to residual block(s) r (..., d) and optionally
    Jacobian block(s) J (..., d, n). Returns (r_tilde, J_tilde_or_None)."""
    s = jnp.sum(r * r, axis=-1)
    sqrt_rho1, residual_scaling, alpha_sq_norm = corrector_coefficients(kind, params, s)
    r_tilde = residual_scaling[..., None] * r
    if J is None:
        return r_tilde, None
    rTJ = _es("...d,...dn->...n", r, J)
    J_tilde = sqrt_rho1[..., None, None] * (
        J - alpha_sq_norm[..., None, None] * r[..., :, None] * rTJ[..., None, :]
    )
    return r_tilde, J_tilde
