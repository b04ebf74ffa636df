"""ProjectionFactor — reprojection residual over (pose, landmark, intrinsics).

Semantics match the reference (src/factors/projection_factor.rs:184-364):
- pose is **world-to-camera** SE3: p_cam = R p_world + t (= pose.act(p_w))
- residual = project(p_cam) - observation (2 rows per observation)
- invalid projection (cheirality etc.) -> zero residual rows and zero
  Jacobian rows (Ceres convention, :227-238)
- Jacobians: ∂uv/∂pose = ∂uv/∂p_cam · [R | -R [p_w]x],
  ∂uv/∂landmark = ∂uv/∂p_cam · R, ∂uv/∂intr from the camera model.

The reference's 7 OptimizeParams aliases (factors/mod.rs:83-101) map to the
``optimize`` tuple: variables for the optimized quantities, constants for
the rest (pass them to the constructor).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax.numpy as jnp
import numpy as np
from ..linalg.smallmm import es as _es

from ..cameras import CameraModel
from ..cameras import get as get_camera
from ..manifolds.utils import quat_to_mat, skew
from .base import Factor

# The reference's OptimizeParams aliases (factors/mod.rs:83-101).
OPTIMIZE_MODES = {
    "bundle_adjustment": ("pose", "landmark"),
    "self_calibration": ("pose", "landmark", "intrinsics"),
    "only_pose": ("pose",),
    "only_landmarks": ("landmark",),
    "only_intrinsics": ("intrinsics",),
    "pose_and_intrinsics": ("pose", "intrinsics"),
    "landmarks_and_intrinsics": ("landmark", "intrinsics"),
}

_SLOT_ORDER = ("pose", "landmark", "intrinsics")


class ProjectionFactor(Factor):
    kind = "projection"

    @classmethod
    def template(cls, camera, optimize=("pose", "landmark", "intrinsics")):
        """Template instance for Problem.add_residual_block_batch — the bulk
        path supplies per-factor data ('obs', and 'const_<slot>' for any
        non-optimized slot) as stacked arrays."""
        return cls(camera, None, optimize)

    def __init__(
        self,
        camera: CameraModel | str,
        observation,
        optimize: Tuple[str, ...] | str = ("pose", "landmark", "intrinsics"),
        *,
        pose: Optional[np.ndarray] = None,
        landmark: Optional[np.ndarray] = None,
        intrinsics: Optional[np.ndarray] = None,
    ):
        if isinstance(camera, str):
            camera = get_camera(camera)
        if isinstance(optimize, str):
            optimize = OPTIMIZE_MODES[optimize]
        self.camera = camera
        self.optimize = tuple(s for s in _SLOT_ORDER if s in optimize)
        self.observation = (
            None
            if observation is None
            else np.asarray(observation, dtype=np.float64).reshape(2)
        )

        consts = {"pose": pose, "landmark": landmark, "intrinsics": intrinsics}
        self._const = {}
        self._is_template = observation is None
        for slot in _SLOT_ORDER:
            if slot in self.optimize:
                if consts[slot] is not None:
                    raise ValueError(f"{slot} is optimized; do not pass a constant value")
            else:
                if consts[slot] is None:
                    if self._is_template:
                        continue  # bulk path supplies const_* arrays in data
                    raise ValueError(
                        f"{slot} is not optimized; pass its constant value to the constructor"
                    )
                self._const[slot] = np.asarray(consts[slot], dtype=np.float64)

    def signature(self):
        return ("projection", self.camera.name, self.optimize)

    def var_manifolds(self) -> List[str]:
        dims = {"pose": "SE3", "landmark": "R3", "intrinsics": f"R{self.camera.intrinsic_dim}"}
        return [dims[s] for s in self.optimize]

    def residual_dim(self) -> int:
        return 2

    def data(self) -> Dict[str, np.ndarray]:
        if self._is_template:
            raise RuntimeError(
                "template ProjectionFactor carries no per-factor data; use "
                "Problem.add_residual_block_batch"
            )
        d = {"obs": self.observation}
        for slot, v in self._const.items():
            d[f"const_{slot}"] = v
        return d

    # class-level camera handle is resolved per-group via signature; store on
    # instances and read from the first block's factor at group build time.
    @classmethod
    def linearize(cls, manifolds, data, params, compute_jacobian):
        raise RuntimeError("ProjectionFactor groups use bound kernels")  # pragma: no cover

    def group_kernel(self):
        """Return a closure bound to this factor's camera + optimize layout
        (all factors in a group share the signature, hence this layout)."""
        camera = self.camera
        optimize = self.optimize

        def kernel(manifolds, data, params, compute_jacobian):
            by_slot = {}
            it = iter(params)
            for slot in _SLOT_ORDER:
                if slot in optimize:
                    by_slot[slot] = next(it)
                else:
                    by_slot[slot] = data[f"const_{slot}"]
            pose, p_w, intr = by_slot["pose"], by_slot["landmark"], by_slot["intrinsics"]

            R = quat_to_mat(pose[..., 3:])
            p_cam = _es("...ij,...j->...i", R, p_w) + pose[..., :3]
            uv, valid = camera.project(intr, p_cam)
            # Overflow guard on top of cheirality: a trial step that sweeps
            # a landmark past a camera's focal plane produces |uv| ~ 1/z ->
            # inf; in f32 the squared residual then overflows and one bad
            # row NaNs the whole cost (the f64 reference never overflows).
            # Mask with `where`, not multiply — NaN * 0 == NaN.
            ok = (
                (valid > 0)
                & jnp.isfinite(uv).all(axis=-1)
                & (jnp.abs(uv) < 1e8).all(axis=-1)
            )
            r = jnp.where(ok[..., None], uv - data["obs"], 0.0)
            if not compute_jacobian:
                return r, None

            J_pc, J_intr = camera.jacobians(intr, p_cam)
            vm = ok[..., None, None]

            def mask(j):
                return jnp.where(vm, j, 0.0)

            jacs = []
            for slot in optimize:
                if slot == "pose":
                    # ∂p_cam/∂xi = [R | -R [p_w]x] (right perturbation)
                    dp = jnp.concatenate(
                        [R, -_es("...ij,...jk->...ik", R, skew(p_w))], axis=-1
                    )
                    jacs.append(mask(_es("...ij,...jk->...ik", J_pc, dp)))
                elif slot == "landmark":
                    jacs.append(mask(_es("...ij,...jk->...ik", J_pc, R)))
                else:
                    jacs.append(mask(J_intr))
            return r, jacs

        return kernel
