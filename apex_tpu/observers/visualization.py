"""Rerun visualization observer (feature-gated).

Mirrors the reference's RerunObserver (src/observers/visualization.rs):
cost / gradient-norm / damping / step-quality time series, SE3 camera
poses, SE2 trajectories, BA landmark clouds, and a final-state log. The
``rerun`` SDK is optional — exactly like the reference's ``visualization``
cargo feature — and a missing SDK raises a clear error at construction,
never at import.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import numpy as np

from .base import OptObserver


def _require_rerun():
    try:
        import rerun as rr  # type: ignore

        return rr
    except ImportError as e:  # pragma: no cover - depends on environment
        raise ImportError(
            "RerunObserver requires the 'rerun-sdk' package (the analogue of "
            "the reference's `visualization` cargo feature). Install it or "
            "use HistoryObserver for headless metric capture."
        ) from e


@dataclasses.dataclass
class VisualizationConfig:
    """Mirrors reference VisualizationConfig presets
    (visualization.rs:145-430)."""

    app_id: str = "apex_tpu"
    spawn: bool = False  # spawn a viewer (live mode)
    save_path: Optional[str] = None  # write .rrd recording
    log_cameras: bool = True
    log_landmarks: bool = True
    log_trajectory: bool = True
    camera_size: float = 0.3
    landmark_point_size: float = 0.02
    max_landmarks_logged: int = 100_000

    @classmethod
    def for_pose_graph(cls) -> "VisualizationConfig":
        return cls(log_landmarks=False)

    @classmethod
    def for_bundle_adjustment(cls) -> "VisualizationConfig":
        return cls(log_trajectory=False)

    @classmethod
    def cameras_only(cls) -> "VisualizationConfig":
        return cls(log_landmarks=False, log_trajectory=False)


class RerunObserver(OptObserver):
    def __init__(self, config: Optional[VisualizationConfig] = None):
        self.config = config or VisualizationConfig()
        self.rr = _require_rerun()
        self.rr.init(self.config.app_id, spawn=self.config.spawn)
        if self.config.save_path:
            self.rr.save(self.config.save_path)

    # -- helpers ---------------------------------------------------------

    def _split_variables(self, variables: Dict[str, np.ndarray]):
        poses3, poses2, points = {}, {}, {}
        for name, v in variables.items():
            v = np.asarray(v)
            if v.shape == (7,):
                poses3[name] = v
            elif v.shape == (3,) and name.startswith("pt_"):
                points[name] = v
            elif v.shape == (3,):
                poses2[name] = v
        return poses3, poses2, points

    def _log_scene(self, variables, iteration):
        rr = self.rr
        cfg = self.config
        rr.set_time_sequence("iteration", iteration)
        poses3, poses2, points = self._split_variables(variables)

        if cfg.log_cameras and poses3:
            from ..manifolds import SE3
            import jax.numpy as jnp

            arr = np.stack(list(poses3.values()))
            # world positions of cameras: T_cw^{-1} translation
            inv = np.asarray(SE3.inverse(jnp.asarray(arr)))
            rr.log("world/cameras", rr.Points3D(inv[:, :3], radii=cfg.camera_size))
        if cfg.log_trajectory and poses2:
            arr = np.stack(list(poses2.values()))
            pts = np.concatenate([arr[:, :2], np.zeros((arr.shape[0], 1))], axis=1)
            rr.log("world/trajectory", rr.LineStrips3D([pts]))
        if cfg.log_landmarks and points:
            arr = np.stack(list(points.values())[: cfg.max_landmarks_logged])
            rr.log("world/landmarks", rr.Points3D(arr, radii=cfg.landmark_point_size))

    # -- OptObserver -----------------------------------------------------

    def on_step(self, variables, iteration, cost, gradient_norm, damping,
                step_norm, step_quality):
        rr = self.rr
        rr.set_time_sequence("iteration", iteration)
        rr.log("metrics/cost", rr.Scalar(cost))
        rr.log("metrics/gradient_norm", rr.Scalar(gradient_norm))
        rr.log("metrics/damping", rr.Scalar(damping))
        rr.log("metrics/step_norm", rr.Scalar(step_norm))
        rr.log("metrics/step_quality", rr.Scalar(step_quality))
        self._log_scene(variables, iteration)

    def notify_complete(self, variables, iterations):
        self._log_scene(variables, iterations)
