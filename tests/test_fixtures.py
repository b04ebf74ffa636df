"""End-to-end tests on checked-in real-format fixture files.

The reference's integration tests run on downloaded intel / sphere2500 /
trafalgar files (tests/integration_tests.rs:24-33); this environment has
no egress, so these fixtures carry the same real-world format quirks:
scientific notation, interleaved records, the TORO scrambled information
order (I11 I12 I22 I33 I13 I23), slightly unnormalized quaternions, BAL
CRLF line endings and irregular whitespace.
"""

import pathlib

import numpy as np
import pytest

import apex_tpu as apx
from apex_tpu.io import load_bal, load_g2o, load_toro

FIXTURES = pathlib.Path(__file__).parent / "fixtures"


def _solve(problem, **kw):
    cfg = apx.LevenbergMarquardtConfig(mode="python", max_iterations=25, **kw)
    return apx.LevenbergMarquardt(cfg).optimize(problem.compile())


def test_intel_excerpt_se2():
    g = load_g2o(FIXTURES / "intel_excerpt.g2o")
    assert len(g.vertices_se2) == 14
    assert len(g.edges_se2) == 15  # 14 odometry + 1 loop closure
    # information matrix parsed from upper-tri sci-notation
    np.testing.assert_allclose(g.edges_se2[0].information[0, 0], 400.0)
    np.testing.assert_allclose(g.edges_se2[0].information[2, 2], 1000.0)
    res = _solve(g.to_problem())
    assert res.converged
    assert res.final_cost < 0.15 * res.initial_cost


def test_toro_excerpt_matches_g2o():
    """Same graph in TORO and g2o form -> same optimum (the scrambled
    TORO info order must be unscrambled)."""
    gt = load_toro(FIXTURES / "toro_excerpt.graph")
    gg = load_g2o(FIXTURES / "intel_excerpt.g2o")
    assert len(gt.vertices_se2) == len(gg.vertices_se2)
    it = gt.edges_se2[0].information
    ig = gg.edges_se2[0].information
    np.testing.assert_allclose(it, ig)
    rt = _solve(gt.to_problem())
    assert rt.converged and rt.final_cost < 0.15 * rt.initial_cost


def test_sphere_excerpt_se3_unnormalized_quats():
    g = load_g2o(FIXTURES / "sphere_excerpt.g2o")
    assert len(g.vertices_se3) == 10
    assert len(g.edges_se3) == 11
    # loader renormalized the deliberately-denormalized quaternions
    for pose in g.vertices_se3.values():
        q = np.asarray(pose)[3:]
        np.testing.assert_allclose(np.linalg.norm(q), 1.0, atol=1e-9)
    res = _solve(g.to_problem())
    assert res.converged
    assert res.final_cost < 0.5 * res.initial_cost


def test_bal_excerpt_crlf():
    ds = load_bal(FIXTURES / "bal_excerpt.txt")
    assert ds.num_cameras == 3 and ds.num_points == 6
    assert ds.num_observations == len(ds.cam_indices)
    from apex_tpu.ba import build_ba_problem

    problem = build_ba_problem(ds, mode="self_calibration")
    cfg = apx.LevenbergMarquardtConfig(
        mode="python", max_iterations=20, linear_solver_type="schur_explicit"
    )
    res = apx.LevenbergMarquardt(cfg).optimize(problem.compile())
    assert res.final_cost < 0.75 * res.initial_cost


def test_g2o_write_read_roundtrip(tmp_path):
    """Write the optimized intel-excerpt graph back to g2o and reload it
    (reference --save-output path, bin/pose_graph_g2o.rs:50-52)."""
    from apex_tpu.io import save_g2o

    g = load_g2o(FIXTURES / "intel_excerpt.g2o")
    out = tmp_path / "opt.g2o"
    save_g2o(out, g)
    g2 = load_g2o(out)
    assert len(g2.vertices_se2) == len(g.vertices_se2)
    np.testing.assert_allclose(
        np.asarray(g2.edges_se2[3].information),
        np.asarray(g.edges_se2[3].information),
    )
