"""Mixed-precision parity: the f32 compile of a problem must reach the same
optimum as f64 within single-precision tolerances (SURVEY.md §7 names f64
parity as the single biggest TPU risk — this quantifies the gap)."""

import numpy as np
import pytest

import apex_tpu as apx
from apex_tpu.ba import build_ba_problem, rmse
from apex_tpu.io import synthetic


def test_pose_graph_f32_matches_f64():
    g = synthetic.synthetic_pose_graph_3d(n_poses=300, rings=10, seed=0)
    problem = g.to_problem()
    cfg = apx.LevenbergMarquardtConfig(max_iterations=100, cost_tolerance=1e-4, mode="jit")

    cp64 = problem.compile(dtype=np.float64)
    r64 = apx.LevenbergMarquardt(cfg).optimize(cp64)
    cp32 = problem.compile(dtype=np.float32)
    r32 = apx.LevenbergMarquardt(cfg).optimize(cp32)

    assert r64.converged and r32.converged
    # final costs agree to f32-level relative accuracy
    np.testing.assert_allclose(r32.final_cost, r64.final_cost, rtol=1e-3)
    # solutions agree pointwise in the tangent sense
    import jax.numpy as jnp

    from apex_tpu.manifolds import SE3

    errs = [
        float(jnp.linalg.norm(SE3.minus(
            jnp.asarray(np.asarray(r32.variables[k], dtype=np.float64)),
            jnp.asarray(r64.variables[k]))))
        for k in list(r64.variables)[::37]
    ]
    assert max(errs) < 5e-2


def test_ba_f32_matches_f64():
    ds = synthetic.synthetic_ba(n_cameras=8, n_points=150, seed=0)
    problem = build_ba_problem(ds)
    cfg = apx.LevenbergMarquardtConfig(
        linear_solver_type="schur_implicit", max_iterations=30
    )
    r64 = apx.LevenbergMarquardt(cfg).optimize(problem.compile(dtype=np.float64))
    r32 = apx.LevenbergMarquardt(cfg).optimize(problem.compile(dtype=np.float32))
    rm64 = rmse(r64.final_cost, ds.num_observations)
    rm32 = rmse(r32.final_cost, ds.num_observations)
    # RMSE within 1% relative
    np.testing.assert_allclose(rm32, rm64, rtol=1e-2)
