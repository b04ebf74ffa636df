"""Shared numerical helpers for Lie-group implementations.

All functions broadcast over arbitrary leading batch dimensions and are safe
under ``jax.jit`` / ``jax.vmap`` / ``jax.grad``: every small-angle branch is
computed with "safe" denominators so neither branch of a ``jnp.where``
produces NaN (which would poison gradients).

Quaternions are stored w-first Hamilton convention ``[w, x, y, z]``, matching
the reference (apex-manifolds so3.rs, doc/CHANGELOG.md:28-29).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..config import small_angle_threshold


def skew(v):
    """Hat operator for R^3: (..., 3) -> (..., 3, 3) with skew(v) @ w = v x w."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([zero, -z, y], axis=-1),
            jnp.stack([z, zero, -x], axis=-1),
            jnp.stack([-y, x, zero], axis=-1),
        ],
        axis=-2,
    )


def quat_mul(q1, q2):
    """Hamilton product of quaternions (..., 4) x (..., 4) -> (..., 4)."""
    w1, x1, y1, z1 = q1[..., 0], q1[..., 1], q1[..., 2], q1[..., 3]
    w2, x2, y2, z2 = q2[..., 0], q2[..., 1], q2[..., 2], q2[..., 3]
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        axis=-1,
    )


def quat_conj(q):
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_normalize(q):
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def quat_to_mat(q):
    """Unit quaternion (..., 4) -> rotation matrix (..., 3, 3)."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    one = jnp.ones_like(w)
    return jnp.stack(
        [
            jnp.stack([one - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)], axis=-1),
            jnp.stack([2 * (xy + wz), one - 2 * (xx + zz), 2 * (yz - wx)], axis=-1),
            jnp.stack([2 * (xz - wy), 2 * (yz + wx), one - 2 * (xx + yy)], axis=-1),
        ],
        axis=-2,
    )


def quat_rotate(q, v):
    """Rotate vector(s) v (..., 3) by quaternion(s) q (..., 4)."""
    qv = q[..., 1:]
    w = q[..., :1]
    t = 2.0 * jnp.cross(qv, v)
    return v + w * t + jnp.cross(qv, t)


def mat_to_quat(R):
    """Rotation matrix (..., 3, 3) -> unit quaternion (..., 4), w >= 0.

    Branch-free Shepperd-style construction usable under jit/vmap.
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    # Four candidate constructions; pick the numerically best one.
    qw_a = jnp.sqrt(jnp.maximum(1.0 + tr, 1e-30)) / 2.0
    q_a = jnp.stack(
        [qw_a, (m21 - m12) / (4 * qw_a), (m02 - m20) / (4 * qw_a), (m10 - m01) / (4 * qw_a)],
        axis=-1,
    )
    qx_b = jnp.sqrt(jnp.maximum(1.0 + m00 - m11 - m22, 1e-30)) / 2.0
    q_b = jnp.stack(
        [(m21 - m12) / (4 * qx_b), qx_b, (m01 + m10) / (4 * qx_b), (m02 + m20) / (4 * qx_b)],
        axis=-1,
    )
    qy_c = jnp.sqrt(jnp.maximum(1.0 - m00 + m11 - m22, 1e-30)) / 2.0
    q_c = jnp.stack(
        [(m02 - m20) / (4 * qy_c), (m01 + m10) / (4 * qy_c), qy_c, (m12 + m21) / (4 * qy_c)],
        axis=-1,
    )
    qz_d = jnp.sqrt(jnp.maximum(1.0 - m00 - m11 + m22, 1e-30)) / 2.0
    q_d = jnp.stack(
        [(m10 - m01) / (4 * qz_d), (m02 + m20) / (4 * qz_d), (m12 + m21) / (4 * qz_d), qz_d],
        axis=-1,
    )

    cand = jnp.stack([tr, m00, m11, m22], axis=-1)
    idx = jnp.argmax(cand, axis=-1)
    qs = jnp.stack([q_a, q_b, q_c, q_d], axis=-2)  # (..., 4, 4)
    q = jnp.take_along_axis(qs, idx[..., None, None].astype(jnp.int32), axis=-2)[..., 0, :]
    # Canonical sign: w >= 0.
    q = jnp.where(q[..., :1] < 0, -q, q)
    return quat_normalize(q)


# ---------------------------------------------------------------------------
# Small-angle coefficient functions (Taylor-switched, NaN-safe both branches).
# theta2 is theta^2; each returns the same shape as theta2.
# ---------------------------------------------------------------------------


def _switch(theta2, exact_fn, taylor):
    eps = small_angle_threshold(theta2.dtype)
    small = theta2 < eps
    safe_t2 = jnp.where(small, jnp.ones_like(theta2), theta2)
    return jnp.where(small, taylor, exact_fn(safe_t2))


def sinc_a(theta2):
    """A(theta) = sin(theta)/theta."""
    taylor = 1.0 - theta2 / 6.0 + theta2 * theta2 / 120.0
    return _switch(theta2, lambda t2: jnp.sin(jnp.sqrt(t2)) / jnp.sqrt(t2), taylor)


def cosc_b(theta2):
    """B(theta) = (1 - cos(theta)) / theta^2."""
    taylor = 0.5 - theta2 / 24.0 + theta2 * theta2 / 720.0
    return _switch(theta2, lambda t2: (1.0 - jnp.cos(jnp.sqrt(t2))) / t2, taylor)


def sinc3_c(theta2):
    """C(theta) = (theta - sin(theta)) / theta^3."""
    taylor = 1.0 / 6.0 - theta2 / 120.0 + theta2 * theta2 / 5040.0

    def exact(t2):
        t = jnp.sqrt(t2)
        return (t - jnp.sin(t)) / (t2 * t)

    return _switch(theta2, exact, taylor)


def jlinv_d(theta2):
    """D(theta) = 1/theta^2 - (1 + cos(theta)) / (2 theta sin(theta)).

    Coefficient of skew^2 in the inverse left/right Jacobian of SO(3).
    """
    taylor = 1.0 / 12.0 + theta2 / 720.0 + theta2 * theta2 / 30240.0

    def exact(t2):
        t = jnp.sqrt(t2)
        return 1.0 / t2 - (1.0 + jnp.cos(t)) / (2.0 * t * jnp.sin(t))

    return _switch(theta2, exact, taylor)


def q_coeff_1(theta2):
    """(theta - sin theta)/theta^3 — same as sinc3_c (kept for readability)."""
    return sinc3_c(theta2)


def q_coeff_2(theta2):
    """(theta^2/2 + cos(theta) - 1) / theta^4."""
    taylor = 1.0 / 24.0 - theta2 / 720.0 + theta2 * theta2 / 40320.0

    def exact(t2):
        t = jnp.sqrt(t2)
        return (t2 / 2.0 + jnp.cos(t) - 1.0) / (t2 * t2)

    return _switch(theta2, exact, taylor)


def q_coeff_3(theta2):
    """(theta - sin(theta) - theta^3/6) / theta^5."""
    taylor = -1.0 / 120.0 + theta2 / 5040.0 - theta2 * theta2 / 362880.0

    def exact(t2):
        t = jnp.sqrt(t2)
        return (t - jnp.sin(t) - t2 * t / 6.0) / (t2 * t2 * t)

    return _switch(theta2, exact, taylor)


def wrap_angle(theta):
    """Wrap angle(s) to (-pi, pi]."""
    return jnp.arctan2(jnp.sin(theta), jnp.cos(theta))
