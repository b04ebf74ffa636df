"""Camera model protocol.

Mirrors the reference CameraModel trait (apex-camera-models/src/lib.rs:414-699):
project / unproject / jacobian_point (2x3) / jacobian_intrinsics (2xK) /
validate_params, plus the world-to-camera pose Jacobian chain
(∂uv/∂p_cam · [R | -R[p_w]x], lib.rs:560-589) which lives in the projection
factor here.

TPU-first: a camera model is a stateless object whose methods are pure
batched functions of an intrinsics array ``intr [..., K]`` and camera-frame
points ``p_cam [..., 3]``. Validity (cheirality + model-specific domain) is
returned as a mask; invalid observations produce zero residual rows
(Ceres convention, projection_factor.rs:227-238).

Subclasses implement `_project(intr, p_cam) -> uv` (pure, NaN-safe via the
`valid` mask machinery) and `valid_mask`; Jacobians default to exact
forward-mode autodiff and may be overridden with closed forms.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

MIN_DEPTH = 1e-6  # matches reference crate::MIN_DEPTH semantics


class CameraModel:
    name: str = "camera"
    intrinsic_dim: int = 0
    # +1: camera looks down +Z (standard); -1: looks down -Z (BAL/Bundler)
    forward_sign: int = +1

    # -- required ------------------------------------------------------

    def _project(self, intr, p_cam):
        """Pure projection (..., K), (..., 3) -> (..., 2). Must be finite for
        any p_cam with valid_mask true; may assume |z| > MIN_DEPTH via the
        safe-z trick below."""
        raise NotImplementedError

    def valid_mask(self, intr, p_cam):
        """True where the projection is well-defined (cheirality etc.)."""
        z = p_cam[..., 2]
        if self.forward_sign > 0:
            return z > MIN_DEPTH
        return z < -MIN_DEPTH

    def unproject(self, intr, uv):
        """Pixel -> unit-norm ray in camera frame (..., 3)."""
        raise NotImplementedError

    def validate_params(self, intr) -> None:
        """Host-side parameter validation; raise ValueError on bad intr."""

    # -- provided ------------------------------------------------------

    def _safe_pcam(self, p_cam):
        """Clamp |z| away from 0 so the masked-out branch stays NaN-free
        under autodiff."""
        z = p_cam[..., 2]
        if self.forward_sign > 0:
            zs = jnp.maximum(z, MIN_DEPTH)
        else:
            zs = jnp.minimum(z, -MIN_DEPTH)
        return jnp.concatenate([p_cam[..., :2], zs[..., None]], axis=-1)

    def project(self, intr, p_cam):
        """Returns (uv (..., 2), valid (...,) bool). Invalid points produce
        finite garbage uv — callers must mask."""
        valid = self.valid_mask(intr, p_cam)
        uv = self._project(intr, self._safe_pcam(p_cam))
        return uv, valid

    def jacobians(self, intr, p_cam):
        """(J_point (..., 2, 3), J_intr (..., 2, K)) — exact forward-mode
        autodiff by default; override with closed forms for hot models."""
        ps = self._safe_pcam(p_cam)

        def single(i, p):
            Jp = jax.jacfwd(lambda pp: self._project(i, pp))(p)
            Ji = jax.jacfwd(lambda ii: self._project(ii, p))(i)
            return Jp, Ji

        flat_i = intr.reshape((-1, intr.shape[-1]))
        flat_p = ps.reshape((-1, 3))
        Jp, Ji = jax.vmap(single)(flat_i, flat_p)
        shape = p_cam.shape[:-1]
        return (
            Jp.reshape(shape + (2, 3)),
            Ji.reshape(shape + (2, self.intrinsic_dim)),
        )

    def project_batch(self, intr, p_cam, invalid_value=1e6):
        """Reference's project_batch with the (1e6, 1e6) invalid sentinel
        (lib.rs:638-649)."""
        uv, valid = self.project(intr, p_cam)
        return jnp.where(valid[..., None], uv, jnp.full_like(uv, invalid_value))
