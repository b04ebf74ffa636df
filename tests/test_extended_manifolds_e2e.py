"""End-to-end LM on the extended groups (SE23 / Sim3 / SGal3): noisy chain
with loop closure recovers ground truth through the generic BetweenFactor —
demonstrating the whole pipeline is manifold-generic."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import apex_tpu as apx
from apex_tpu import manifolds


@pytest.mark.parametrize("gname", [
    "SE23", "Sim3", pytest.param("SGal3", marks=pytest.mark.slow), "SO3", "SO2",
])
def test_between_chain_converges(gname):
    G = manifolds.get(gname)
    rng = np.random.default_rng(1)
    key = jax.random.PRNGKey(0)

    n = 8
    truth = [np.asarray(G.identity())]
    for k in jax.random.split(key, n - 1):
        step = 0.3 * jax.random.normal(k, (G.dof,))
        truth.append(np.asarray(G.plus(jnp.asarray(truth[-1]), step)))

    problem = apx.Problem()
    for i, t in enumerate(truth):
        if i == 0:
            init = t
        else:
            noise = jnp.asarray(rng.normal(0, 0.05, G.dof))
            init = np.asarray(G.plus(jnp.asarray(t), noise))
        problem.add_variable(f"x{i}", gname, init)
    problem.fix_variable("x0")

    from apex_tpu.factors import BetweenFactor

    for i in range(n - 1):
        meas = np.asarray(G.between(jnp.asarray(truth[i]), jnp.asarray(truth[i + 1])))
        problem.add_residual_block([f"x{i}", f"x{i+1}"], BetweenFactor(G, meas))
    # loop closure first -> last
    meas = np.asarray(G.between(jnp.asarray(truth[0]), jnp.asarray(truth[-1])))
    problem.add_residual_block(["x0", f"x{n-1}"], BetweenFactor(G, meas))

    res = apx.LevenbergMarquardt(
        apx.LevenbergMarquardtConfig(max_iterations=60)
    ).optimize(problem)
    assert res.converged, (gname, res.status)
    assert res.final_cost < 1e-12, (gname, res.final_cost)
    for i in range(n):
        err = np.linalg.norm(
            np.asarray(G.minus(jnp.asarray(res.variables[f"x{i}"]), jnp.asarray(truth[i])))
        )
        assert err < 1e-5, (gname, i, err)
