"""Multi-device sharding tests on the virtual 8-CPU mesh (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

import apex_tpu as apx
from apex_tpu.io import synthetic
from apex_tpu.parallel import make_sharded_lm_step, make_sharded_normal_fn


@pytest.fixture
def mesh():
    devs = np.array(jax.devices())
    return Mesh(devs, ("data",))


def test_sharded_normal_matches_single_device(mesh):
    g = synthetic.synthetic_pose_graph_2d(n_poses=50, trajectory="ring", seed=2)
    cp = g.to_problem().compile()
    values = cp.initial_values()

    H0, g0, c0 = jax.jit(cp.assemble_normal)(values)
    fn, shard_args = make_sharded_normal_fn(cp, mesh)
    H1, g1, c1 = jax.jit(fn)(values, *shard_args)

    np.testing.assert_allclose(np.asarray(H1), np.asarray(H0), atol=1e-12)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g0), atol=1e-12)
    np.testing.assert_allclose(float(c1), float(c0), rtol=1e-14)


def test_sharded_lm_step_converges(mesh):
    g = synthetic.synthetic_pose_graph_3d(n_poses=48, rings=4, seed=9)
    cp = g.to_problem().compile()
    step = make_sharded_lm_step(cp, mesh)

    @jax.jit
    def run(values):
        damping = jnp.asarray(1e-3, cp.dtype)
        nu = jnp.asarray(2.0, cp.dtype)
        cost0 = cp.cost(values)
        state = (values, damping, nu, cost0)
        for _ in range(8):
            state = step(*state)
        return cost0, state[3]

    cost0, cost_final = run(cp.initial_values())
    assert float(cost_final) < 0.15 * float(cost0)


def test_sharded_with_loss_and_fixed(mesh):
    g = synthetic.synthetic_pose_graph_2d(n_poses=33, seed=4)  # odd count: padding
    problem = g.to_problem(loss=apx.HuberLoss(1.0), fix_first=True)
    cp = problem.compile()
    values = cp.initial_values()
    H0, g0, c0 = jax.jit(cp.assemble_normal)(values)
    fn, shard_args = make_sharded_normal_fn(cp, mesh)
    H1, g1, c1 = jax.jit(fn)(values, *shard_args)
    np.testing.assert_allclose(np.asarray(H1), np.asarray(H0), atol=1e-12)
    np.testing.assert_allclose(float(c1), float(c0), rtol=1e-14)


def test_sharded_schur_ba_step(mesh):
    """Observation-sharded implicit Schur BA step matches the single-device
    Schur solver and converges."""
    import apex_tpu as apx
    from apex_tpu.ba import build_ba_problem
    from apex_tpu.io import synthetic as synth
    from apex_tpu.linalg.schur import SchurContext
    from apex_tpu.parallel import make_sharded_schur_step

    ds = synth.synthetic_ba(n_cameras=6, n_points=80, seed=1)
    cp = build_ba_problem(ds).compile()
    values = cp.initial_values()

    # single-device reference solve
    ctx = SchurContext(cp, variant="iterative", pcg_tolerance=1e-12,
                       pcg_max_iterations=500)
    dx0, g0, c0, _pred = jax.jit(lambda v: ctx.solve(v, 1e-3))(values)

    step, shard_args = make_sharded_schur_step(
        cp, mesh, pcg_tolerance=1e-12, pcg_max_iterations=500)

    # run several sharded LM iterations; cost must drop substantially
    @jax.jit
    def run(values):
        damping = jnp.asarray(1e-3, cp.dtype)
        nu = jnp.asarray(2.0, cp.dtype)
        cost0 = cp.cost(values)
        state = (values, damping, nu, cost0)
        for _ in range(6):
            state = step(*state)
        return cost0, state[3]

    cost0, cost6 = run(values)
    assert float(cost6) < 0.3 * float(cost0)


@pytest.mark.slow
def test_sharded_banded_lm_step_matches_dense_sharded():
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from apex_tpu.io import synthetic
    from apex_tpu.parallel import make_sharded_banded_lm_step, make_sharded_lm_step

    g = synthetic.synthetic_pose_graph_3d(n_poses=96, rings=4, seed=0)
    cp = g.to_problem().compile(dtype=np.float64)
    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
    stepb = jax.jit(make_sharded_banded_lm_step(cp, mesh))
    stepd = jax.jit(make_sharded_lm_step(cp, mesh))
    vals = cp.initial_values()
    damping = jnp.asarray(1e-3)
    nu = jnp.asarray(2.0)
    cost = cp.cost(vals)
    with mesh:
        vb, db, nb, cb = stepb(vals, damping, nu, cost)
        _, _, _, cd = stepd(vals, damping, nu, cost)
        cb1 = cb
        for _ in range(2):
            vb, db, nb, cb = stepb(vb, db, nb, cb)
    # banded and dense sharded steps solve the SAME normal equations: the
    # post-step costs must agree to f64 solve accuracy, not merely be finite
    assert np.isclose(float(cb1), float(cd), rtol=1e-8), (float(cb1), float(cd))
    assert np.isclose(float(stepd(vals, damping, nu, cost)[3]), float(cd))
    assert float(cb) < float(cb1) < float(cost)
