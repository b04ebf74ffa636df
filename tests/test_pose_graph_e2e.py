"""End-to-end pose-graph optimization tests (reference: tests/
integration_tests.rs — vertex/edge counts, convergence, >85% cost
improvement, finite final cost). Uses synthetic datasets (no network)."""

import jax.numpy as jnp
import numpy as np
import pytest

import apex_tpu as apx
from apex_tpu.io import synthetic
from apex_tpu.io.g2o import load_g2o, save_g2o
from apex_tpu.io.toro import load_toro, save_toro


def test_ring_se2_lm_converges():
    g = synthetic.synthetic_pose_graph_2d(n_poses=100, trajectory="ring", seed=1)
    assert g.num_vertices == 100 and g.num_edges == 100
    problem = g.to_problem()
    result = apx.LevenbergMarquardt().optimize(problem)
    assert result.converged, result.status
    assert result.final_cost < 0.15 * result.initial_cost
    assert np.isfinite(result.final_cost)
    # chi2 must improve too
    chi_before = g.chi2()
    chi_after = g.chi2(result.variables)
    assert chi_after < chi_before


def test_manhattan_se2_with_loops():
    g = synthetic.synthetic_pose_graph_2d(
        n_poses=150, trajectory="manhattan", loop_stride=10, seed=3
    )
    result = apx.LevenbergMarquardt().optimize(g.to_problem())
    assert result.converged
    assert result.final_cost < 0.15 * result.initial_cost


def test_sphere_se3_lm_converges():
    g = synthetic.synthetic_pose_graph_3d(n_poses=120, rings=6, seed=5)
    assert g.is_se3
    problem = g.to_problem()
    result = apx.LevenbergMarquardt().optimize(problem)
    assert result.converged, result.status
    assert result.final_cost < 0.15 * result.initial_cost
    # quaternions stay normalized
    for v in result.variables.values():
        assert abs(np.linalg.norm(v[3:]) - 1.0) < 1e-9


def test_se3_jit_mode_matches_python_mode():
    g = synthetic.synthetic_pose_graph_3d(n_poses=60, rings=4, seed=7)
    r1 = apx.LevenbergMarquardt().optimize(g.to_problem())
    cfg = apx.LevenbergMarquardtConfig(mode="jit")
    r2 = apx.LevenbergMarquardt(cfg).optimize(g.to_problem())
    assert r1.status == r2.status
    assert r1.iterations == r2.iterations
    np.testing.assert_allclose(r1.final_cost, r2.final_cost, rtol=1e-12)


def test_robust_loss_sweep_with_priors_parking_garage():
    """BASELINE key config: robust-loss sweep + priors on a
    parking-garage-style SE3 graph (multi-level rings; the reference runs
    the 15-loss menu over parking-garage, bin/pose_graph_g2o.rs). Every
    loss must converge with a ManifoldPriorFactor anchoring the gauge."""
    from apex_tpu.core import losses as L
    from apex_tpu.factors.prior import ManifoldPriorFactor

    g = synthetic.synthetic_pose_graph_3d(n_poses=48, rings=4, seed=21)
    sweep = [
        L.L2Loss(), L.HuberLoss(1.0), L.CauchyLoss(1.0),
        L.FairLoss(1.3998), L.GemanMcClureLoss(1.0), L.WelschLoss(2.9846),
        L.TukeyBiweightLoss(4.6851), L.TrimmedMeanLoss(2.0),
        L.BarronGeneralLoss(-2.0, 1.0), L.TDistributionLoss(5.0),
    ]
    first = sorted(g.vertices_se3)[0]
    anchor = np.asarray(g.vertices_se3[first])
    for loss in sweep:
        problem = g.to_problem(loss=loss)
        problem.add_residual_block(
            [f"x{first}"], ManifoldPriorFactor("SE3", anchor))
        cfg = apx.LevenbergMarquardtConfig(max_iterations=40)
        r = apx.LevenbergMarquardt(cfg).optimize(problem)
        assert r.converged, (loss.kind, r.summary())
        assert r.final_cost < 0.6 * r.initial_cost, (loss.kind, r.summary())


def test_robust_loss_on_outlier_edges():
    g = synthetic.synthetic_pose_graph_2d(n_poses=80, trajectory="ring", seed=11)
    # corrupt 3 loop edges hard
    for e in g.edges_se2[-3:]:
        e.measurement = e.measurement + np.array([2.0, -1.5, 0.7])
    res_l2 = apx.LevenbergMarquardt().optimize(g.to_problem())
    res_huber = apx.LevenbergMarquardt().optimize(g.to_problem(loss=apx.HuberLoss(1.0)))
    assert res_huber.converged
    # Robust solution should stay closer to a clean-graph solution
    g_clean = synthetic.synthetic_pose_graph_2d(n_poses=80, trajectory="ring", seed=11)
    res_clean = apx.LevenbergMarquardt().optimize(g_clean.to_problem())

    def traj_err(a, b):
        return np.mean(
            [np.linalg.norm(a[k][:2] - b[k][:2]) for k in a.keys()]
        )

    err_huber = traj_err(res_huber.variables, res_clean.variables)
    err_l2 = traj_err(res_l2.variables, res_clean.variables)
    assert err_huber < err_l2


def test_g2o_roundtrip_se2(tmp_path):
    g = synthetic.synthetic_pose_graph_2d(n_poses=20, seed=13)
    p = tmp_path / "t.g2o"
    save_g2o(p, g)
    g2 = load_g2o(p)
    assert g2.num_vertices == 20 and g2.num_edges == 20
    for i in range(20):
        np.testing.assert_allclose(g2.vertices_se2[i], g.vertices_se2[i], atol=1e-15)
    for e1, e2 in zip(g.edges_se2, g2.edges_se2):
        np.testing.assert_allclose(e1.measurement, e2.measurement, atol=1e-15)
        np.testing.assert_allclose(e1.information, e2.information, atol=1e-15)


def test_g2o_roundtrip_se3(tmp_path):
    g = synthetic.synthetic_pose_graph_3d(n_poses=12, rings=3, seed=17)
    p = tmp_path / "t3.g2o"
    save_g2o(p, g)
    g2 = load_g2o(p)
    assert g2.is_se3 and g2.num_vertices == 12
    for i in range(12):
        # quaternion sign may flip on normalize; compare as rotations
        v1, v2 = g.vertices_se3[i], g2.vertices_se3[i]
        np.testing.assert_allclose(v1[:3], v2[:3], atol=1e-15)
        assert min(np.linalg.norm(v1[3:] - v2[3:]), np.linalg.norm(v1[3:] + v2[3:])) < 1e-14


def test_g2o_inline_content(tmp_path):
    """Loader tested with inline content, mirroring the reference's
    tempfile-based tests (apex-io/src/lib.rs:437-460)."""
    p = tmp_path / "mini.g2o"
    p.write_text(
        "VERTEX_SE2 0 0.0 0.0 0.0\n"
        "VERTEX_SE2 1 1.0 0.1 0.05\n"
        "# comment line\n"
        "EDGE_SE2 0 1 1.0 0.0 0.0 500.0 0.0 0.0 500.0 0.0 100.0\n"
    )
    g = load_g2o(p)
    assert g.num_vertices == 2 and g.num_edges == 1
    e = g.edges_se2[0]
    assert e.information[0, 0] == 500.0
    assert e.information[2, 2] == 100.0
    assert e.information[1, 1] == 500.0


def test_g2o_se3_quaternion_order(tmp_path):
    p = tmp_path / "q.g2o"
    # file order qx qy qz qw; storage order [t, qw, qx, qy, qz]
    p.write_text("VERTEX_SE3:QUAT 0 1.0 2.0 3.0 0.1 0.2 0.3 0.9273618495495704\n")
    g = load_g2o(p)
    v = g.vertices_se3[0]
    np.testing.assert_allclose(v[:3], [1.0, 2.0, 3.0])
    assert abs(v[3] - 0.9273618495495704 / np.linalg.norm([0.9273618495495704, 0.1, 0.2, 0.3])) < 1e-12
    assert abs(np.linalg.norm(v[3:]) - 1.0) < 1e-12


def test_g2o_malformed_raises(tmp_path):
    p = tmp_path / "bad.g2o"
    p.write_text("VERTEX_SE2 0 1.0\n")
    with pytest.raises(ValueError, match="malformed"):
        load_g2o(p)


def test_toro_roundtrip(tmp_path):
    g = synthetic.synthetic_pose_graph_2d(n_poses=15, seed=19)
    p = tmp_path / "t.toro"
    save_toro(p, g)
    g2 = load_toro(p)
    assert g2.num_vertices == 15
    for e1, e2 in zip(g.edges_se2, g2.edges_se2):
        np.testing.assert_allclose(e1.measurement, e2.measurement, atol=1e-15)
        np.testing.assert_allclose(e1.information, e2.information, atol=1e-15)


def test_fixed_variable_stays_fixed():
    g = synthetic.synthetic_pose_graph_2d(n_poses=30, seed=23)
    problem = g.to_problem(fix_first=True)
    result = apx.LevenbergMarquardt().optimize(problem)
    assert result.converged
    np.testing.assert_allclose(result.variables["x0"], g.vertices_se2[0], atol=1e-15)


def test_partial_fix():
    g = synthetic.synthetic_pose_graph_2d(n_poses=30, seed=29)
    problem = g.to_problem()
    problem.fix_variable("x0", indices=[2])  # fix heading only
    result = apx.LevenbergMarquardt().optimize(problem)
    assert result.converged
    assert abs(result.variables["x0"][2] - g.vertices_se2[0][2]) < 1e-15


def test_gauss_newton_equivalent_when_far_from_singular():
    """LM with tiny damping on a well-conditioned problem reaches the same
    optimum as the default config."""
    g = synthetic.synthetic_pose_graph_2d(n_poses=40, seed=31)
    r1 = apx.LevenbergMarquardt().optimize(g.to_problem(fix_first=True))
    cfg = apx.LevenbergMarquardtConfig(damping=1e-8)
    r2 = apx.LevenbergMarquardt(cfg).optimize(g.to_problem(fix_first=True))
    np.testing.assert_allclose(r1.final_cost, r2.final_cost, rtol=1e-6)


def test_dense_qr_solver_matches_cholesky():
    g = synthetic.synthetic_pose_graph_2d(n_poses=25, seed=37)
    r1 = apx.LevenbergMarquardt().optimize(g.to_problem())
    cfg = apx.LevenbergMarquardtConfig(linear_solver_type="dense_qr")
    r2 = apx.LevenbergMarquardt(cfg).optimize(g.to_problem())
    assert r2.converged
    np.testing.assert_allclose(r1.final_cost, r2.final_cost, rtol=1e-8)


def test_covariance_estimation():
    g = synthetic.synthetic_pose_graph_2d(n_poses=20, seed=41)
    problem = g.to_problem(fix_first=True)
    cfg = apx.LevenbergMarquardtConfig(compute_covariances=True)
    result = apx.LevenbergMarquardt(cfg).optimize(problem)
    assert result.covariances is not None
    for n, C in result.covariances.items():
        assert C.shape == (3, 3)
        # covariance is symmetric PSD (fixed vars excluded from H nullspace
        # by the free-mask + damping of H at solution ... but H here is
        # undamped: x0's block may be ~0 or large; just check symmetry+finite)
        np.testing.assert_allclose(C, C.T, atol=1e-8)

    # uncertainty should grow with graph distance from the fixed anchor
    tr = [np.trace(result.covariances[f"x{i}"]) for i in range(1, 10)]
    assert tr[-1] > tr[0]


def test_banded_selective_covariance_matches_dense():
    """compute_covariances_for rides the banded CR solve above 4096 DOF
    (no dense [D, D] H); its blocks must match the dense-inverse path.
    Exercised at 700 SE3 poses (D = 4200) where both still fit."""
    from apex_tpu.core.covariance import (_banded_covariances_for,
                                          compute_covariances,
                                          compute_covariances_for)

    g = synthetic.synthetic_pose_graph_3d(n_poses=700, rings=10, seed=7)
    problem = g.to_problem(fix_first=True)
    cp = problem.compile(dtype=np.float64)
    vals = cp.initial_values()
    names = [list(cp.var_loc.keys())[i] for i in (1, 350, 699)]
    sel = compute_covariances_for(cp, vals, names)  # banded path (D=4200)
    dense = compute_covariances(cp, vals, names=names)
    for n in names:
        np.testing.assert_allclose(sel[n], dense[n], rtol=1e-7, atol=1e-10)
    # the fixed anchor has zero covariance on both paths
    anchor = list(cp.var_loc.keys())[0]
    pinned = _banded_covariances_for(cp, vals, [anchor])[anchor]
    np.testing.assert_allclose(pinned, 0.0, atol=1e-12)
