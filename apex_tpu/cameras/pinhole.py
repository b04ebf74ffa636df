"""Standard pinhole camera: 4 intrinsics [fx, fy, cx, cy], +Z forward.

Matches the reference apex-camera-models/src/pinhole.rs.
"""

from __future__ import annotations

import jax.numpy as jnp

from .base import CameraModel


class PinholeCamera(CameraModel):
    name = "pinhole"
    intrinsic_dim = 4
    forward_sign = +1

    def _project(self, intr, p_cam):
        fx, fy, cx, cy = intr[..., 0], intr[..., 1], intr[..., 2], intr[..., 3]
        x, y, z = p_cam[..., 0], p_cam[..., 1], p_cam[..., 2]
        iz = 1.0 / z
        return jnp.stack([fx * x * iz + cx, fy * y * iz + cy], axis=-1)

    def jacobians(self, intr, p_cam):
        ps = self._safe_pcam(p_cam)
        fx, fy = intr[..., 0], intr[..., 1]
        x, y, z = ps[..., 0], ps[..., 1], ps[..., 2]
        iz = 1.0 / z
        iz2 = iz * iz
        zero = jnp.zeros_like(x)
        one = jnp.ones_like(x)
        J_point = jnp.stack(
            [
                jnp.stack([fx * iz, zero, -fx * x * iz2], axis=-1),
                jnp.stack([zero, fy * iz, -fy * y * iz2], axis=-1),
            ],
            axis=-2,
        )
        J_intr = jnp.stack(
            [
                jnp.stack([x * iz, zero, one, zero], axis=-1),
                jnp.stack([zero, y * iz, zero, one], axis=-1),
            ],
            axis=-2,
        )
        return J_point, J_intr

    def unproject(self, intr, uv):
        fx, fy, cx, cy = intr[..., 0], intr[..., 1], intr[..., 2], intr[..., 3]
        xn = (uv[..., 0] - cx) / fx
        yn = (uv[..., 1] - cy) / fy
        ray = jnp.stack([xn, yn, jnp.ones_like(xn)], axis=-1)
        return ray / jnp.linalg.norm(ray, axis=-1, keepdims=True)

    def validate_params(self, intr) -> None:
        import numpy as np

        intr = np.asarray(intr)
        if intr.shape[-1] != 4:
            raise ValueError(f"pinhole expects 4 intrinsics [fx,fy,cx,cy], got {intr.shape}")
        if np.any(intr[..., :2] <= 0) or not np.all(np.isfinite(intr)):
            raise ValueError("pinhole focal lengths must be positive and finite")
