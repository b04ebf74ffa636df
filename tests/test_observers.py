"""Visualization observer depth tests (reference visualization.rs panels:
heatmaps, gradient bars, frusta, displacement stats, convergence banner)."""

import numpy as np
import pytest

from apex_tpu.observers import HistoryObserver, RerunObserver, VisualizationConfig
from apex_tpu.observers.visualization import (
    MemorySink,
    VisualizationMode,
    displacement_statistics,
    downsample_matrix,
    gradient_to_image,
    hessian_to_image,
    se3_camera_pose,
    value_to_rgb_heatmap,
)


def test_heatmap_colormap():
    rgb = value_to_rgb_heatmap(np.array([0.0, 1.0, -1.0, np.nan, 0.5]), 1.0)
    assert rgb.shape == (5, 3)
    assert (rgb[0] == [255, 255, 255]).all()  # zero -> white
    assert (rgb[1] == [0, 0, 255]).all()  # max -> saturated blue
    assert (rgb[2] == [0, 0, 255]).all()  # sign-symmetric (|v|)
    assert (rgb[3] == [255, 255, 255]).all()  # non-finite -> white
    assert rgb[4, 0] == rgb[4, 1] and rgb[4, 2] == 255  # white->blue ramp
    # max_abs == 0 -> all white
    assert (value_to_rgb_heatmap(np.array([1.0]), 0.0) == 255).all()


def test_downsample_matrix_block_average():
    H = np.zeros((4, 4))
    H[0, 0] = 2.0
    H[1, 1] = 4.0  # both land in target block (0,0) -> avg of nonzeros = 3
    H[3, 3] = 7.0
    ds = downsample_matrix(H, 2, 2)
    assert ds.shape == (2, 2)
    assert ds[0, 0] == pytest.approx(3.0)
    assert ds[1, 1] == pytest.approx(7.0)
    assert ds[0, 1] == 0.0 and ds[1, 0] == 0.0
    # target larger than matrix: clamps, no crash
    assert downsample_matrix(H, 16, 16).shape == (4, 4)
    assert downsample_matrix(np.zeros((3, 3)), 2, 2).shape == (2, 2)


def test_matrix_images():
    rng = np.random.default_rng(0)
    H = rng.normal(size=(40, 40))
    img = hessian_to_image(H, 16)
    assert img.shape == (16, 16, 3) and img.dtype == np.uint8
    bar = gradient_to_image(rng.normal(size=200), 64)
    assert bar.shape == (50, 64, 3) and bar.dtype == np.uint8
    # short gradient narrower than requested width
    assert gradient_to_image(np.ones(3), 64).shape == (50, 3, 3)


def test_displacement_statistics():
    init = {"a": np.zeros(3), "b": np.zeros(3), "missing": np.ones(3)}
    final = {"a": np.array([3.0, 4.0, 0.0]), "b": np.zeros(3)}
    st = displacement_statistics(init, final)
    assert st["count"] == 2
    assert st["max"] == pytest.approx(5.0)
    assert st["min"] == pytest.approx(0.0)
    assert st["avg"] == pytest.approx(2.5)
    assert displacement_statistics({}, {})["count"] == 0


def test_se3_camera_pose_invert():
    ident = np.array([1.0, -2.0, 3.0, 1.0, 0.0, 0.0, 0.0])  # t + unit quat
    pos, quat = se3_camera_pose(ident, invert=False)
    np.testing.assert_allclose(pos, [1.0, -2.0, 3.0])
    np.testing.assert_allclose(quat, [0.0, 0.0, 0.0, 1.0])  # xyzw
    pos_i, _ = se3_camera_pose(ident, invert=True)
    np.testing.assert_allclose(pos_i, [-1.0, 2.0, -3.0], atol=1e-12)


def _solve_with_observer(vis_cfg, n_poses=12, expose=True):
    import apex_tpu as apx
    from apex_tpu.io import synthetic

    g = synthetic.synthetic_pose_graph_3d(n_poses=n_poses, rings=2, seed=0)
    cfg = apx.LevenbergMarquardtConfig(
        mode="python", max_iterations=5, expose_matrix_data=expose
    )
    lm = apx.LevenbergMarquardt(cfg)
    obs = RerunObserver(vis_cfg, sink=MemorySink())
    lm.add_observer(obs)
    cp = g.to_problem().compile()
    obs.log_initial_graph(cp.values_dict(cp.initial_values()))
    res = lm.optimize(cp)
    obs.log_convergence(res.status.name)
    return obs, res


def test_rerun_observer_full_panels():
    obs, res = _solve_with_observer(VisualizationConfig.for_pose_graph())
    sink = obs.sink
    paths = sink.paths()
    for p in [
        "metrics/cost",
        "metrics/gradient_norm",
        "metrics/damping",
        "metrics/step_norm",
        "metrics/step_quality",
        "optimization/matrices/hessian",
        "optimization/matrices/gradient",
        "optimization/status",
        "statistics/camera_displacement/avg",
    ]:
        assert p in paths, f"missing panel {p}"
    # initial + per-iteration + final scenes
    assert any(p.startswith("initial_graph/cameras/") for p in paths)
    assert any(p.startswith("world/cameras/") for p in paths)
    assert any(p.startswith("final_graph/cameras/") for p in paths)
    # heatmap image logged with the configured downsample size
    imgs = dict(sink.by_kind("image"))
    assert imgs["optimization/matrices/hessian"]["shape"][2] == 3
    assert imgs["optimization/matrices/gradient"]["shape"][0] == 50
    # cost series decreases
    costs = [d["value"] for p, d in sink.by_kind("scalar") if p == "metrics/cost"]
    assert costs[-1] < costs[0]
    assert obs.displacements["cameras"]["count"] > 0


def test_rerun_observer_initial_and_final_mode():
    cfg = VisualizationConfig.for_pose_graph()
    cfg.mode = VisualizationMode.INITIAL_AND_FINAL
    obs, _ = _solve_with_observer(cfg, expose=False)
    paths = obs.sink.paths()
    # scalars still logged, per-iteration world scene suppressed
    assert "metrics/cost" in paths
    assert not any(p.startswith("world/") for p in paths)
    assert any(p.startswith("initial_graph/") for p in paths)
    assert any(p.startswith("final_graph/") for p in paths)
    assert not any(p.startswith("optimization/matrices/") for p in paths)


def test_rerun_observer_ba_landmarks_and_se2():
    # synthetic variables dict: 2 cameras, 3 landmarks, 2 SE2 poses
    variables = {
        "pose_0": np.array([0.0, 0, 0, 1, 0, 0, 0]),
        "pose_1": np.array([1.0, 0, 0, 1, 0, 0, 0]),
        "pt_0": np.zeros(3),
        "pt_1": np.ones(3),
        "pt_2": np.array([0.0, 1.0, 2.0]),
        "x_0": np.array([0.0, 0.0, 0.1]),
        "x_1": np.array([1.0, 0.0, 0.2]),
    }
    cfg = VisualizationConfig()  # everything on
    obs = RerunObserver(cfg, sink=MemorySink())
    obs.log_initial_ba_state(variables)
    assert obs.config.invert_camera_poses  # BA convention enabled
    moved = dict(variables)
    moved["pt_1"] = np.ones(3) * 2.0
    obs.notify_complete(moved, 7)
    pts = dict(obs.sink.by_kind("points3d"))
    assert pts["initial_graph/landmarks"]["count"] == 3
    assert pts["final_graph/landmarks"]["count"] == 3
    # initial blue vs optimized green colors
    assert pts["initial_graph/landmarks"]["color"] != pts["final_graph/landmarks"]["color"]
    boxes = dict(obs.sink.by_kind("boxes2d"))
    assert boxes["final_graph/se2_poses"]["count"] == 2
    assert obs.displacements["landmarks"]["max"] == pytest.approx(np.sqrt(3.0))
    banner = [d["text"] for p, d in obs.sink.by_kind("text")]
    assert any("7 iterations" in t for t in banner)


def test_history_observer_still_works():
    import apex_tpu as apx
    from apex_tpu.io import synthetic

    g = synthetic.synthetic_pose_graph_3d(n_poses=10, rings=2, seed=0)
    lm = apx.LevenbergMarquardt(
        apx.LevenbergMarquardtConfig(mode="python", max_iterations=3)
    )
    h = HistoryObserver()
    lm.add_observer(h)
    lm.optimize(g.to_problem())
    assert len(h.costs) >= 1
