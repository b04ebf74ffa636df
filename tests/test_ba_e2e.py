"""Bundle adjustment end-to-end tests (reference: tests/
bundle_adjustment_integration.rs + camera_*_integration.rs synthetic
self-calibration pattern)."""

import jax.numpy as jnp
import numpy as np
import pytest

import apex_tpu as apx
from apex_tpu.ba import build_ba_problem, rmse
from apex_tpu.factors.projection import ProjectionFactor
from apex_tpu.io import synthetic
from apex_tpu.io.bal import load_bal, save_bal


@pytest.fixture(scope="module")
def small_ba():
    return synthetic.synthetic_ba(n_cameras=8, n_points=150, seed=0)


def _solve(ds, solver_type, mode="self_calibration", **kw):
    problem = build_ba_problem(ds, mode=mode)
    cfg = apx.LevenbergMarquardtConfig(
        linear_solver_type=solver_type, max_iterations=30, **kw
    )
    return apx.LevenbergMarquardt(cfg).optimize(problem)


def test_projection_factor_jacobians_vs_numeric():
    import jax

    from apex_tpu import cameras
    from apex_tpu.manifolds import SE3

    cam = cameras.get("bal_pinhole")
    f = ProjectionFactor.template(cam, ("pose", "landmark", "intrinsics"))
    kernel = f.group_kernel()
    manifolds = tuple(__import__("apex_tpu").manifolds.get(m) for m in f.var_manifolds())

    key = jax.random.PRNGKey(0)
    pose = SE3.random(key)[None]
    lm = jnp.asarray([[0.3, -0.2, 0.5]])
    # place landmark in front: transform a point at z=-2 in cam frame to world
    p_cam = jnp.asarray([[0.2, 0.1, -2.0]])
    lm = SE3.act(SE3.inverse(pose), p_cam)
    intr = jnp.asarray([[900.0, -0.1, 0.01]])
    data = {"obs": jnp.asarray([[5.0, -3.0]])}

    r, jacs = kernel(manifolds, data, [pose, lm, intr], True)
    assert r.shape == (1, 2)

    EPS = 1e-7
    for s, (G, val) in enumerate(zip(manifolds, [pose, lm, intr])):
        for k in range(G.dof):
            e = jnp.zeros(G.dof).at[k].set(EPS)
            params_p = [pose, lm, intr]
            params_m = [pose, lm, intr]
            params_p[s] = G.plus(val, e[None])
            params_m[s] = G.plus(val, -e[None])
            rp, _ = kernel(manifolds, data, params_p, False)
            rm, _ = kernel(manifolds, data, params_m, False)
            num = (rp - rm) / (2 * EPS)
            np.testing.assert_allclose(
                np.asarray(jacs[s][0, :, k]), np.asarray(num[0]), atol=1e-4, rtol=1e-5
            )


def test_invalid_projection_zero_residual():
    from apex_tpu import cameras
    from apex_tpu.manifolds import SE3

    cam = cameras.get("bal_pinhole")
    f = ProjectionFactor.template(cam, ("pose", "landmark", "intrinsics"))
    kernel = f.group_kernel()
    manifolds = tuple(__import__("apex_tpu").manifolds.get(m) for m in f.var_manifolds())
    pose = SE3.identity()[None]
    lm = jnp.asarray([[0.0, 0.0, 5.0]])  # BEHIND a -Z camera
    intr = jnp.asarray([[800.0, 0.0, 0.0]])
    data = {"obs": jnp.asarray([[1.0, 1.0]])}
    r, jacs = kernel(manifolds, data, [pose, lm, intr], True)
    np.testing.assert_allclose(np.asarray(r), 0.0)
    for J in jacs:
        np.testing.assert_allclose(np.asarray(J), 0.0)
        assert np.all(np.isfinite(np.asarray(J)))


@pytest.mark.parametrize("solver", ["schur_implicit", "schur_explicit", "dense_cholesky"])
def test_ba_self_calibration_converges(small_ba, solver):
    res = _solve(small_ba, solver)
    assert res.converged, res.status
    final_rmse = rmse(res.final_cost, small_ba.num_observations)
    assert final_rmse < 1.0  # pixel noise is 1.0 px
    assert res.final_cost < 0.15 * res.initial_cost


def test_warm_start_q_termination_keeps_converging(small_ba):
    """Regression: the Nash-Sofer Q-stagnation criterion must measure
    progress relative to THIS PCG call (Q0-relative) — against the
    absolute Q, a good warm start reads as instant stagnation, PCG hands
    back ~the previous LM step and the solve stalls above the noise
    floor (observed at venice scale: RMSE 0.749 stall vs 0.68 floor).
    Warm start + q_tol 0.1 (the criterion is opt-in) must land within 1%
    of the exact-solve final cost."""
    r_exact = _solve(small_ba, "schur_implicit", pcg_tolerance=1e-10,
                     pcg_max_iterations=500, pcg_forcing=False)
    r_adaptive = _solve(small_ba, "schur_implicit", pcg_q_tolerance=0.1)
    assert r_adaptive.final_cost < 1.01 * r_exact.final_cost, (
        r_adaptive.summary(), r_exact.summary())


def test_schur_solvers_agree_with_dense(small_ba):
    r_dense = _solve(small_ba, "dense_cholesky")
    # forcing disabled: the agreement check wants exact solves (the forcing
    # sequence takes a slightly different LM path by design)
    r_imp = _solve(small_ba, "schur_implicit", pcg_tolerance=1e-10,
                   pcg_max_iterations=500, pcg_forcing=False)
    r_exp = _solve(small_ba, "schur_explicit")
    np.testing.assert_allclose(r_exp.final_cost, r_dense.final_cost, rtol=1e-6)
    np.testing.assert_allclose(r_imp.final_cost, r_dense.final_cost, rtol=1e-6)


def test_ba_bundle_adjustment_mode(small_ba):
    """pose+landmark only, intrinsics constant."""
    res = _solve(small_ba, "schur_implicit", mode="bundle_adjustment")
    assert res.converged
    assert res.final_cost < 0.2 * res.initial_cost
    # intrinsics are not variables in this mode
    assert not any(n.startswith("intr_") for n in res.variables)


def test_ba_only_pose_mode(small_ba):
    res = _solve(small_ba, "dense_cholesky", mode="only_pose")
    assert res.converged
    assert not any(n.startswith("pt_") for n in res.variables)


def test_ba_only_landmarks_mode(small_ba):
    res = _solve(small_ba, "schur_implicit", mode="only_landmarks")
    assert res.converged


def test_gauge_fixed_first_camera(small_ba):
    problem = build_ba_problem(small_ba, mode="self_calibration")
    cp = problem.compile()
    res = _solve(small_ba, "schur_implicit")
    np.testing.assert_allclose(
        res.variables["pose_0000"], small_ba.camera_se3()[0], atol=1e-12
    )


def test_bal_roundtrip(tmp_path, small_ba):
    p = tmp_path / "test.bal"
    save_bal(p, small_ba)
    ds2 = load_bal(p)
    assert ds2.num_cameras == small_ba.num_cameras
    assert ds2.num_points == small_ba.num_points
    assert ds2.num_observations == small_ba.num_observations
    np.testing.assert_allclose(ds2.points, small_ba.points, rtol=1e-12)
    np.testing.assert_allclose(ds2.observations, small_ba.observations, rtol=1e-9)
    np.testing.assert_allclose(ds2.focals, small_ba.focals, rtol=1e-12)


def test_bal_negative_focal_normalized(tmp_path, small_ba):
    import dataclasses

    bad = dataclasses.replace(small_ba, focals=small_ba.focals.copy())
    bad.focals[0] = -100.0
    p = tmp_path / "bad.bal"
    save_bal(p, bad)
    ds2 = load_bal(p)
    assert ds2.focals[0] == 500.0  # DEFAULT_FOCAL_LENGTH fallback


def test_max_points_limit(small_ba):
    problem = build_ba_problem(small_ba, max_points=50)
    cp = problem.compile()
    n_pts = sum(1 for n in cp.var_loc if n.startswith("pt_"))
    assert n_pts == 50
    # With only 50 points the self-calibration is weakly constrained; check
    # substantial cost reduction rather than full convergence.
    res = apx.LevenbergMarquardt(
        apx.LevenbergMarquardtConfig(linear_solver_type="schur_implicit", max_iterations=30)
    ).optimize(problem)
    assert res.final_cost < 0.2 * res.initial_cost


def test_for_bundle_adjustment_preset(small_ba):
    cfg = apx.LevenbergMarquardtConfig.for_bundle_adjustment()
    assert cfg.linear_solver_type == "schur_implicit"
    assert cfg.schur_preconditioner == "schur_jacobi"
    assert cfg.max_iterations == 20
    problem = build_ba_problem(small_ba)
    res = apx.LevenbergMarquardt(cfg).optimize(problem)
    assert np.isfinite(res.final_cost)
    assert res.final_cost < 0.15 * res.initial_cost
