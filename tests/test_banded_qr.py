"""Banded block-QR tier (reference SparseQRSolver, sparse/qr.rs:13-262).

The reference QR-factorizes the sparse normal equations H; here the
equivalent is a banded panel QR over block-tridiagonal storage
(linalg/banded_qr.py). Checks: numeric agreement with a dense solve,
damping semantics, rank-robustness at singular H, and e2e LM parity with
the Cholesky tier.
"""

import jax.numpy as jnp
import numpy as np
import pytest

import apex_tpu as apx
from apex_tpu.linalg.banded_qr import make_blocktri_qr_core
from apex_tpu.io import synthetic


def _random_blocktri(n, m, seed, spd_shift=None):
    """Random symmetric block-tridiagonal (Dg, Cg, dense H)."""
    rng = np.random.default_rng(seed)
    D = n * m
    H = np.zeros((D, D))
    Dg = np.zeros((n, m, m))
    Cg = np.zeros((n, m, m))
    for i in range(n):
        A = rng.normal(size=(m, m))
        A = A + A.T
        if spd_shift is not None:
            A += spd_shift * np.eye(m)
        Dg[i] = A
        H[i * m:(i + 1) * m, i * m:(i + 1) * m] = A
        if i > 0:
            C = rng.normal(size=(m, m))
            Cg[i] = C
            H[i * m:(i + 1) * m, (i - 1) * m:i * m] = C
            H[(i - 1) * m:i * m, i * m:(i + 1) * m] = C.T
    return Dg, Cg, H


@pytest.mark.parametrize("n,m", [(1, 5), (2, 4), (7, 6), (16, 8)])
def test_qr_core_matches_dense(n, m):
    Dg, Cg, H = _random_blocktri(n, m, seed=n * 31 + m, spd_shift=4.0 * m)
    b = np.random.default_rng(99).normal(size=(n, m))
    core = make_blocktri_qr_core(n * m, m, jnp.float64)
    x = np.asarray(core(jnp.asarray(Dg), jnp.asarray(Cg), jnp.asarray(b)))
    ref = np.linalg.solve(H, b.reshape(-1))
    np.testing.assert_allclose(x, ref, rtol=1e-10, atol=1e-10)


def test_qr_core_damping():
    n, m = 5, 4
    Dg, Cg, H = _random_blocktri(n, m, seed=3, spd_shift=3.0 * m)
    b = np.random.default_rng(4).normal(size=(n, m))
    lam = 0.37
    core = make_blocktri_qr_core(n * m, m, jnp.float64)
    x = np.asarray(core(jnp.asarray(Dg), jnp.asarray(Cg), jnp.asarray(b),
                        damping=lam))
    ref = np.linalg.solve(H + lam * np.eye(n * m), b.reshape(-1))
    np.testing.assert_allclose(x, ref, rtol=1e-10, atol=1e-10)


def test_qr_core_singular_with_damping():
    """QR with lambda > 0 tolerates a PSD-singular H (the gauge-free
    pose-graph case): finite and equal to the damped dense solve."""
    n, m = 4, 3
    rng = np.random.default_rng(7)
    D = n * m
    # Rank-deficient: H = G^T G with G [D-2, D]
    G = rng.normal(size=(D - 2, D))
    H = G.T @ G
    Dg = np.stack([H[i * m:(i + 1) * m, i * m:(i + 1) * m] for i in range(n)])
    Cg = np.zeros((n, m, m))
    for i in range(1, n):
        Cg[i] = H[i * m:(i + 1) * m, (i - 1) * m:i * m]
    # zero the parts of H outside the band so dense ref matches the storage
    Hb = np.zeros_like(H)
    for i in range(n):
        Hb[i * m:(i + 1) * m, i * m:(i + 1) * m] = Dg[i]
        if i > 0:
            Hb[i * m:(i + 1) * m, (i - 1) * m:i * m] = Cg[i]
            Hb[(i - 1) * m:i * m, i * m:(i + 1) * m] = Cg[i].T
    b = rng.normal(size=(n, m))
    lam = 1e-4
    core = make_blocktri_qr_core(D, m, jnp.float64)
    x = np.asarray(core(jnp.asarray(Dg), jnp.asarray(Cg), jnp.asarray(b),
                        damping=lam))
    assert np.all(np.isfinite(x))
    ref = np.linalg.solve(Hb + lam * np.eye(D), b.reshape(-1))
    np.testing.assert_allclose(x, ref, rtol=1e-8, atol=1e-8)


def test_lm_sparse_qr_matches_cholesky_e2e():
    """linear_solver_type="sparse_qr" rides the banded QR tier and lands
    on the same solution as the default Cholesky tier."""
    g = synthetic.synthetic_pose_graph_2d(n_poses=60, loop_stride=3, seed=11)
    results = {}
    for solver in ("sparse_cholesky", "sparse_qr"):
        cp = g.to_problem(fix_first=True).compile(dtype=np.float64)
        cfg = apx.LevenbergMarquardtConfig(
            linear_solver_type=solver, max_iterations=40, mode="python")
        results[solver] = apx.LevenbergMarquardt(cfg).optimize(cp)
    rc, rq = results["sparse_cholesky"], results["sparse_qr"]
    assert rq.converged, rq.summary()
    np.testing.assert_allclose(rq.final_cost, rc.final_cost,
                               rtol=1e-8, atol=1e-12)


def test_dogleg_sparse_qr():
    """DogLeg rides the banded QR tier too (reference DogLeg accepts any
    LinearSolver, dog_leg.rs)."""
    g = synthetic.synthetic_pose_graph_2d(n_poses=50, loop_stride=5, seed=9)
    cp = g.to_problem(fix_first=True).compile(dtype=np.float64)
    cfg = apx.DogLegConfig(linear_solver_type="sparse_qr", max_iterations=40)
    r = apx.DogLeg(cfg).optimize(cp)
    assert r.converged, r.summary()
    assert r.final_cost < 0.1 * r.initial_cost


def test_sparse_qr_rides_rcm_ordering():
    """sparse_qr over a shuffled-name graph with ordering="auto": the RCM
    band recovery serves the QR tier exactly like the Cholesky tier."""
    from apex_tpu.core.problem import Problem
    from apex_tpu.factors.between import BetweenFactor

    n = 120
    g = synthetic.synthetic_pose_graph_3d(n_poses=n, rings=6, seed=3)
    rng = np.random.default_rng(0)
    perm = rng.permutation(n)
    p = Problem()
    names = {vid: f"x{perm[vid]:05d}" for vid in range(n)}
    for vid in sorted(g.vertices_se3):
        p.add_variable(names[vid], "SE3", g.vertices_se3[vid])
    for e in g.edges_se3:
        p.add_residual_block([names[e.frm], names[e.to]],
                             BetweenFactor("SE3", e.measurement))
    cp = p.compile(ordering="auto", dtype=np.float64)
    cfg = apx.LevenbergMarquardtConfig(
        linear_solver_type="sparse_qr", max_iterations=40, mode="jit")
    r = apx.LevenbergMarquardt(cfg).optimize(cp)
    assert r.converged, r.summary()
    assert r.final_cost < 0.05 * r.initial_cost


def test_gauss_newton_sparse_qr():
    g = synthetic.synthetic_pose_graph_2d(n_poses=40, loop_stride=4, seed=13)
    cp = g.to_problem(fix_first=True).compile(dtype=np.float64)
    cfg = apx.GaussNewtonConfig(linear_solver_type="sparse_qr",
                                max_iterations=25)
    r = apx.GaussNewton(cfg).optimize(cp)
    assert r.converged, r.summary()
    assert r.final_cost < 0.1 * r.initial_cost


def test_lm_sparse_qr_jit_mode():
    g = synthetic.synthetic_pose_graph_3d(n_poses=40, rings=4, seed=5)
    cp = g.to_problem().compile(dtype=np.float64)
    cfg = apx.LevenbergMarquardtConfig(
        linear_solver_type="sparse_qr", max_iterations=30, mode="jit")
    r = apx.LevenbergMarquardt(cfg).optimize(cp)
    assert r.converged, r.summary()
    assert r.final_cost < 0.05 * r.initial_cost
