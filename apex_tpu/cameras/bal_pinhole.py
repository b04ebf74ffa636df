"""BAL (Snavely/Bundler) pinhole camera — the model used in all BA
benchmarks.

Matches the reference BALPinholeCameraStrict (apex-camera-models/src/
bal_pinhole.rs): 3 intrinsics [f, k1, k2], camera looks down **-Z**
(z < -MIN_DEPTH in front), no principal point, fx = fy:

    x_n = x / (-z);  y_n = y / (-z)
    r2 = x_n^2 + y_n^2
    d = 1 + k1 r2 + k2 r2^2
    uv = f * d * (x_n, y_n)

Closed-form Jacobians (hot path for every BA observation).
"""

from __future__ import annotations

import jax.numpy as jnp

from .base import CameraModel


class BALPinholeCamera(CameraModel):
    name = "bal_pinhole"
    intrinsic_dim = 3
    forward_sign = -1

    def _project(self, intr, p_cam):
        f, k1, k2 = intr[..., 0], intr[..., 1], intr[..., 2]
        x, y, z = p_cam[..., 0], p_cam[..., 1], p_cam[..., 2]
        iz = -1.0 / z
        xn = x * iz
        yn = y * iz
        r2 = xn * xn + yn * yn
        d = 1.0 + r2 * (k1 + k2 * r2)
        return (f * d)[..., None] * jnp.stack([xn, yn], axis=-1)

    def jacobians(self, intr, p_cam):
        ps = self._safe_pcam(p_cam)
        f, k1, k2 = intr[..., 0], intr[..., 1], intr[..., 2]
        x, y, z = ps[..., 0], ps[..., 1], ps[..., 2]
        iz = -1.0 / z
        xn = x * iz
        yn = y * iz
        r2 = xn * xn + yn * yn
        d = 1.0 + r2 * (k1 + k2 * r2)
        dd_dr2 = k1 + 2.0 * k2 * r2

        # d(uv)/d(xn, yn)
        a = 2.0 * dd_dr2
        J_uxn = f * (d + a * xn * xn)
        J_uyn = f * (a * xn * yn)
        J_vxn = J_uyn
        J_vyn = f * (d + a * yn * yn)

        # d(xn, yn)/d(p_cam): xn = -x/z
        # dxn/dx = -1/z = iz ; dxn/dz = x/z^2
        z2 = z * z
        dxn = jnp.stack([iz, jnp.zeros_like(iz), x / z2], axis=-1)  # (...,3)
        dyn = jnp.stack([jnp.zeros_like(iz), iz, y / z2], axis=-1)

        Ju = J_uxn[..., None] * dxn + J_uyn[..., None] * dyn
        Jv = J_vxn[..., None] * dxn + J_vyn[..., None] * dyn
        J_point = jnp.stack([Ju, Jv], axis=-2)  # (..., 2, 3)

        # d(uv)/d(f, k1, k2)
        du_df = d * xn
        dv_df = d * yn
        du_dk1 = f * xn * r2
        dv_dk1 = f * yn * r2
        du_dk2 = f * xn * r2 * r2
        dv_dk2 = f * yn * r2 * r2
        J_intr = jnp.stack(
            [
                jnp.stack([du_df, du_dk1, du_dk2], axis=-1),
                jnp.stack([dv_df, dv_dk1, dv_dk2], axis=-1),
            ],
            axis=-2,
        )  # (..., 2, 3)
        return J_point, J_intr

    def unproject(self, intr, uv):
        """Undistorted inverse (k1=k2 handled iteratively, 8 fixed-point
        steps — matches the accuracy class of the reference's iterative
        unprojection)."""
        f, k1, k2 = intr[..., 0], intr[..., 1], intr[..., 2]
        xd = uv[..., 0] / f
        yd = uv[..., 1] / f
        xn, yn = xd, yd
        for _ in range(8):
            r2 = xn * xn + yn * yn
            d = 1.0 + r2 * (k1 + k2 * r2)
            xn = xd / d
            yn = yd / d
        ray = jnp.stack([xn, yn, -jnp.ones_like(xn)], axis=-1)
        return ray / jnp.linalg.norm(ray, axis=-1, keepdims=True)

    def validate_params(self, intr) -> None:
        import numpy as np

        intr = np.asarray(intr)
        if intr.shape[-1] != 3:
            raise ValueError(f"BAL pinhole expects 3 intrinsics [f,k1,k2], got {intr.shape}")
        if np.any(intr[..., 0] <= 0) or not np.all(np.isfinite(intr)):
            raise ValueError("BAL pinhole focal length must be positive and finite")
