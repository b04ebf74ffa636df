"""Define a custom factor with autodiff Jacobians (the reference's
Rosenbrock extension path, levenberg_marquardt.rs:1103-1137)."""

import sys

sys.path.insert(0, ".")

import jax.numpy as jnp
import numpy as np

import apex_tpu as apx
from apex_tpu.factors.base import AutoDiffFactor


class RangeBearingFactor(AutoDiffFactor):
    """2D range-bearing observation of a landmark from an SE2 pose."""

    kind = "range_bearing"

    def __init__(self, rng, bearing):
        self.meas = np.array([rng, bearing])

    def signature(self):
        return ("range_bearing",)

    def var_manifolds(self):
        return ["SE2", "R2"]

    def residual_dim(self):
        return 2

    def data(self):
        return {"meas": self.meas}

    @classmethod
    def residual(cls, manifolds, data, params):
        pose, lm = params
        dx = lm[..., 0] - pose[..., 0]
        dy = lm[..., 1] - pose[..., 1]
        rng = jnp.sqrt(dx * dx + dy * dy)
        bearing = jnp.arctan2(dy, dx) - pose[..., 2]
        bearing = jnp.arctan2(jnp.sin(bearing), jnp.cos(bearing))
        return jnp.stack([rng, bearing], axis=-1) - data["meas"]


def main():
    rng = np.random.default_rng(0)
    truth_lm = np.array([3.0, 4.0])
    poses = [np.array([0.0, 0.0, 0.0]), np.array([1.0, 0.0, 0.5]),
             np.array([2.0, 1.0, 1.0])]

    problem = apx.Problem()
    for i, p in enumerate(poses):
        problem.add_variable(f"x{i}", "SE2", p)
        problem.fix_variable(f"x{i}")
    problem.add_variable("lm", "R2", truth_lm + rng.normal(0, 0.5, 2))
    for i, p in enumerate(poses):
        d = truth_lm - p[:2]
        r = np.linalg.norm(d) + rng.normal(0, 0.01)
        b = np.arctan2(d[1], d[0]) - p[2] + rng.normal(0, 0.01)
        problem.add_residual_block([f"x{i}", "lm"], RangeBearingFactor(r, b))

    res = apx.LevenbergMarquardt().optimize(problem)
    print(res.summary())
    print("landmark estimate:", res.variables["lm"], "truth:", truth_lm)


if __name__ == "__main__":
    main()
