"""Tests for auxiliary subsystems: errors, checkpointing, linalg utils,
profiling, logger, examples smoke."""

import numpy as np
import pytest

import apex_tpu as apx
from apex_tpu.core.checkpoint import CheckpointObserver, OptimizerCheckpoint
from apex_tpu.errors import (
    ApexError,
    CoreError,
    IoError,
    LinAlgError,
    OptimizerError,
)
from apex_tpu.io import synthetic
from apex_tpu.linalg.utils import dense_to_sparse, sparse_to_dense
from apex_tpu.utils import init_logger
from apex_tpu.utils.profiling import SectionTimer


def test_error_hierarchy():
    assert issubclass(CoreError, ApexError)
    assert issubclass(OptimizerError, ApexError)
    assert issubclass(LinAlgError, ApexError)
    with pytest.raises(ApexError):
        raise IoError("file gone")
    e = CoreError("bad").log()
    assert isinstance(e, CoreError)
    e2 = LinAlgError("solve failed").log(source=ValueError("inner"))
    assert isinstance(e2.__cause__, ValueError)


def test_sparse_dense_roundtrip():
    M = np.array([[1.0, 0.0, 2.0], [0.0, 0.0, 3.0]])
    r, c, v = dense_to_sparse(M)
    assert len(v) == 3
    M2 = np.asarray(sparse_to_dense(r, c, v, M.shape))
    np.testing.assert_allclose(M2, M)
    # thresholding
    r, c, v = dense_to_sparse(M, threshold=2.5)
    assert len(v) == 1 and v[0] == 3.0


def test_checkpoint_roundtrip(tmp_path):
    g = synthetic.synthetic_pose_graph_2d(n_poses=25, seed=6)
    cp = g.to_problem().compile()
    path = str(tmp_path / "ck.npz")

    lm = apx.LevenbergMarquardt(apx.LevenbergMarquardtConfig(max_iterations=2))
    lm.add_observer(CheckpointObserver(cp, path, every=1))
    r1 = lm.optimize(cp)
    assert r1.status == apx.Status.MAX_ITERATIONS_REACHED

    ck = OptimizerCheckpoint.load(path)
    ck.validate_against(cp)
    r2 = apx.LevenbergMarquardt().optimize(cp, checkpoint=ck)
    assert r2.converged
    r_full = apx.LevenbergMarquardt().optimize(cp)
    np.testing.assert_allclose(r2.final_cost, r_full.final_cost, atol=1e-12)


def test_checkpoint_shape_mismatch(tmp_path):
    g = synthetic.synthetic_pose_graph_2d(n_poses=25, seed=6)
    cp = g.to_problem().compile()
    g2 = synthetic.synthetic_pose_graph_2d(n_poses=30, seed=6)
    cp2 = g2.to_problem().compile()
    ck = OptimizerCheckpoint(
        values=cp.initial_values(), damping=1e-3, nu=2.0, cost=1.0, iteration=0
    )
    with pytest.raises(ValueError, match="shape"):
        ck.validate_against(cp2)


def test_section_timer():
    t = SectionTimer()
    with t.section("a"):
        pass
    with t.section("a"):
        pass
    with t.section("b"):
        pass
    assert t.counts["a"] == 2 and t.counts["b"] == 1
    assert "a" in t.report()


def test_logger():
    log = init_logger("DEBUG")
    assert log.name == "apex_tpu"
    log.debug("debug line")
    log.info("info line")


def test_dds_gated():
    from apex_tpu.io.dds import DdsSubscriber, ros_topic_to_dds

    assert ros_topic_to_dds("/odom") == "rt/odom"
    assert ros_topic_to_dds("rt/odom") == "rt/odom"
    with pytest.raises(ImportError, match="cyclonedds"):
        DdsSubscriber(topic="/odom", message_type="nav_msgs/msg/Odometry")


def test_rerun_gated():
    from apex_tpu.observers import RerunObserver

    with pytest.raises(ImportError, match="rerun"):
        RerunObserver()


@pytest.mark.parametrize(
    "example",
    ["custom_factor", "covariance_estimation", "load_graph_file"],
)
def test_examples_smoke(example, monkeypatch, capsys):
    import runpy
    import sys

    monkeypatch.setattr(sys, "argv", ["example"])
    runpy.run_path(f"examples/{example}.py", run_name="__main__")
    out = capsys.readouterr().out
    assert "status=" in out or "estimate" in out


def test_expose_matrix_data_observer():
    import apex_tpu as apx
    from apex_tpu.io import synthetic as synth

    captured = []

    class MatObs:
        def on_step(self, *a, **k):
            pass

        def set_matrix_data(self, H, g):
            captured.append((H.shape, g.shape))

        def notify_complete(self, *a):
            pass

    g = synth.synthetic_pose_graph_2d(n_poses=20, seed=9)
    cp = g.to_problem().compile()
    lm = apx.LevenbergMarquardt(
        apx.LevenbergMarquardtConfig(expose_matrix_data=True, max_iterations=3)
    )
    lm.add_observer(MatObs())
    lm.optimize(cp)
    assert captured and captured[0] == ((60, 60), (60,))


def test_synthetic_closure_strides():
    """closure_strides adds one loop-closure family per ring offset
    (bench.py cubicle rung density; default (1,) is sphere2500's)."""
    base = synthetic.synthetic_pose_graph_3d(n_poses=200, rings=10, seed=0)
    dense = synthetic.synthetic_pose_graph_3d(
        n_poses=200, rings=10, seed=0, closure_strides=(1, 2))
    per_ring = 20
    assert len(base.edges_se3) == 199 + (200 - per_ring)
    assert len(dense.edges_se3) == 199 + (200 - per_ring) + (200 - 2 * per_ring)
    # stride-2 closures double the graph's pose bandwidth
    span = max(abs(e.to - e.frm) for e in dense.edges_se3)
    assert span == 2 * per_ring
    # solvable: LM through the banded tier converges
    import numpy as np

    import apex_tpu as apx

    cp = dense.to_problem().compile(dtype=np.float64)
    cfg = apx.LevenbergMarquardtConfig(
        mode="jit", max_iterations=50, cost_tolerance=1e-4,
        linear_solver_type="sparse_cholesky", damping="auto")
    r = apx.LevenbergMarquardt(cfg).optimize(cp)
    assert r.converged and r.final_cost < 0.05 * r.initial_cost
