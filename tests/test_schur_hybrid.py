"""Schur solver on a HYBRID problem: BA observations + odometry between
factors on the camera poses. The pose-pose factors merge all cameras into
one entity (union-find), so H_cc degenerates to a single dense block —
the solver must still match the plain dense solution."""

import numpy as np
import pytest

import apex_tpu as apx
from apex_tpu.ba import build_ba_problem
from apex_tpu.factors import BetweenFactor
from apex_tpu.io import synthetic
from apex_tpu.linalg.schur import SchurContext
from apex_tpu.manifolds import SE3

import jax.numpy as jnp


@pytest.fixture(scope="module")
def hybrid_problem():
    ds = synthetic.synthetic_ba(n_cameras=6, n_points=80, seed=3)
    problem = build_ba_problem(ds, mode="bundle_adjustment")
    # odometry chain between consecutive camera poses (world-to-camera)
    poses = ds.camera_se3()
    for i in range(ds.num_cameras - 1):
        meas = np.asarray(
            SE3.between(jnp.asarray(poses[i]), jnp.asarray(poses[i + 1]))
        )
        problem.add_residual_block(
            [f"pose_{i:04d}", f"pose_{i+1:04d}"], BetweenFactor("SE3", meas)
        )
    return problem


def test_hybrid_entities_merge(hybrid_problem):
    cp = hybrid_problem.compile()
    ctx = SchurContext(cp)
    # all 6 poses merge into one entity through the odometry chain
    assert ctx.num_entities == 1
    assert ctx.entity_dof == 6 * 6


@pytest.mark.slow
def test_hybrid_schur_matches_dense(hybrid_problem):
    cp = hybrid_problem.compile()
    cfg_d = apx.LevenbergMarquardtConfig(max_iterations=30)
    r_dense = apx.LevenbergMarquardt(cfg_d).optimize(cp)

    cfg_i = apx.LevenbergMarquardtConfig(
        linear_solver_type="schur_implicit", max_iterations=30,
        pcg_tolerance=1e-12, pcg_max_iterations=500,
    )
    r_imp = apx.LevenbergMarquardt(cfg_i).optimize(hybrid_problem.compile())
    cfg_e = apx.LevenbergMarquardtConfig(
        linear_solver_type="schur_explicit", max_iterations=30
    )
    r_exp = apx.LevenbergMarquardt(cfg_e).optimize(hybrid_problem.compile())

    np.testing.assert_allclose(r_imp.final_cost, r_dense.final_cost, rtol=1e-6)
    np.testing.assert_allclose(r_exp.final_cost, r_dense.final_cost, rtol=1e-6)


def test_ba_entities_per_camera():
    ds = synthetic.synthetic_ba(n_cameras=8, n_points=100, seed=5)
    cp = build_ba_problem(ds, mode="self_calibration").compile()
    ctx = SchurContext(cp)
    # each camera: pose (6) + intrinsics (3) = one 9-DOF entity
    assert ctx.num_entities == 8
    assert ctx.entity_dof == 9


def test_explicit_schur_pair_chunking_matches():
    """The scan-chunked pair accumulation (bounds peak memory when dense
    visibility makes the pair count quadratic) must match the single-chunk
    path exactly."""
    ds = synthetic.synthetic_ba(n_cameras=6, n_points=80, seed=2)
    cp = build_ba_problem(ds, mode="self_calibration").compile()

    def run(chunk):
        orig = SchurContext.PAIR_CHUNK
        SchurContext.PAIR_CHUNK = chunk
        try:
            cfg = apx.LevenbergMarquardtConfig(
                linear_solver_type="schur_explicit", max_iterations=8)
            return apx.LevenbergMarquardt(cfg).optimize(cp)
        finally:
            SchurContext.PAIR_CHUNK = orig

    r1 = run(1 << 18)  # everything in one chunk
    r2 = run(37)       # many chunks + ragged padding tail
    np.testing.assert_allclose(r2.final_cost, r1.final_cost, rtol=1e-10)
    assert r1.iterations == r2.iterations


def test_segsum_bucket_matches_scatter(monkeypatch):
    """The gather-only bucket segment-sum path must match scatter bitwise-
    close through a full implicit-Schur solve."""
    ds = synthetic.synthetic_ba(n_cameras=6, n_points=90, seed=9)
    cp = build_ba_problem(ds, mode="self_calibration").compile()

    def run(mode):
        monkeypatch.setenv("APEX_TPU_SEGSUM", mode)
        cfg = apx.LevenbergMarquardtConfig(
            linear_solver_type="schur_implicit", max_iterations=6,
            pcg_tolerance=1e-12, pcg_max_iterations=300)
        return apx.LevenbergMarquardt(cfg).optimize(cp)

    rb, rs = run("bucket"), run("scatter")
    np.testing.assert_allclose(rb.final_cost, rs.final_cost, rtol=1e-9)
