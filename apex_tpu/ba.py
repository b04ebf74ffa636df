"""Bundle adjustment problem builder.

Mirrors the reference CLI's problem construction (bin/bundle_adjustment.rs):
- variables ``pose_NNNN`` (SE3, world-to-camera), ``intr_NNNN`` (R3
  [f, k1, k2]), ``pt_NNNNN`` (R3) (:232-257)
- one ProjectionFactor<BALPinholeCameraStrict> per observation with
  HuberLoss(1.0) (:425-428)
- first camera fixed (all 6 DOF) for gauge (:294-298)
- the 5 optimization modes via --type (:70-83)
- RMSE = sqrt(cost / num_observations) (:364-373)
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from .cameras import get as get_camera
from .core.losses import HuberLoss, Loss
from .core.problem import Problem
from .factors.projection import OPTIMIZE_MODES, ProjectionFactor
from .io.bal import BalDataset


def build_ba_problem(
    ds: BalDataset,
    mode: str = "self_calibration",
    loss: Optional[Loss] = HuberLoss(1.0),
    fix_first_camera: bool = True,
    max_points: Optional[int] = None,
    camera_model: str = "bal_pinhole",
) -> Problem:
    """Build an optimization Problem from a BAL dataset."""
    if mode not in OPTIMIZE_MODES:
        raise KeyError(f"unknown mode {mode!r}; known: {sorted(OPTIMIZE_MODES)}")
    optimize = OPTIMIZE_MODES[mode]
    camera = get_camera(camera_model)

    cam_idx = ds.cam_indices
    pt_idx = ds.point_indices
    obs = ds.observations
    if max_points is not None and max_points < ds.num_points:
        keep_pts = np.zeros(ds.num_points, dtype=bool)
        keep_pts[:max_points] = True
        keep = keep_pts[pt_idx]
        cam_idx, pt_idx, obs = cam_idx[keep], pt_idx[keep], obs[keep]
        n_pts = max_points
    else:
        n_pts = ds.num_points

    # Canonical observation order: sorted by (landmark, camera). The
    # landmark axis carries the widest segment sums in the Schur pipeline
    # (W^T x to ~1M landmarks at venice scale); with factors pre-sorted by
    # landmark those sums need no permutation at all and their gathers are
    # contiguous. Sum reordering only changes f32 rounding.
    order = np.lexsort((cam_idx, pt_idx))
    cam_idx, pt_idx, obs = cam_idx[order], pt_idx[order], obs[order]

    problem = Problem()
    pose_names = [f"pose_{i:04d}" for i in range(ds.num_cameras)]
    intr_names = [f"intr_{i:04d}" for i in range(ds.num_cameras)]
    pt_names = [f"pt_{j:05d}" for j in range(n_pts)]

    # Only optimized quantities become variables; the rest ride along as
    # per-observation constants (reference OptimizeParams semantics).
    if "pose" in optimize:
        problem.add_variables_batch(pose_names, "SE3", ds.camera_se3())
    if "intrinsics" in optimize:
        problem.add_variables_batch(intr_names, "R3", ds.intrinsics())
    if "landmark" in optimize:
        problem.add_variables_batch(pt_names, "R3", ds.points[:n_pts])

    slot_keys = []
    data = {"obs": np.asarray(obs)}
    for slot in ("pose", "landmark", "intrinsics"):
        names = {"pose": pose_names, "landmark": pt_names, "intrinsics": intr_names}[slot]
        per_obs_idx = {"pose": cam_idx, "landmark": pt_idx, "intrinsics": cam_idx}[slot]
        if slot in optimize:
            # indexed fast path: (base_names, idx) avoids 10^6-scale
            # per-observation string lists at venice scale
            slot_keys.append((names, per_obs_idx))
        else:
            vals = {
                "pose": ds.camera_se3(),
                "landmark": ds.points[:n_pts],
                "intrinsics": ds.intrinsics(),
            }[slot]
            data[f"const_{slot}"] = vals[per_obs_idx]

    template = ProjectionFactor.template(camera, optimize)
    problem.add_residual_block_batch(slot_keys, template, data, loss=loss)

    if fix_first_camera and "pose" in optimize:
        problem.fix_variable(pose_names[0])
    return problem


def rmse(cost: float, num_observations: int) -> float:
    """RMSE in pixels = sqrt(cost / N) (bin/bundle_adjustment.rs:364-373)."""
    return float(np.sqrt(cost / num_observations))
