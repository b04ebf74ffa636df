"""Covariance estimation after convergence (reference:
examples/covariance_estimation.rs): uncertainty grows with graph distance
from the fixed anchor."""

import sys

sys.path.insert(0, ".")

import numpy as np

import apex_tpu as apx
from apex_tpu.io import synthetic


def main():
    g = synthetic.synthetic_pose_graph_2d(n_poses=40, trajectory="ring", seed=3)
    problem = g.to_problem(fix_first=True)
    cfg = apx.LevenbergMarquardtConfig(compute_covariances=True)
    res = apx.LevenbergMarquardt(cfg).optimize(problem)
    print(res.summary(), "\n")
    print(f"{'pose':>6} {'sigma_x':>9} {'sigma_y':>9} {'sigma_theta':>11}")
    for i in range(0, 40, 5):
        C = res.covariances[f"x{i}"]
        sx, sy, st = np.sqrt(np.diag(C))
        print(f"x{i:<5} {sx:>9.5f} {sy:>9.5f} {st:>11.5f}")


if __name__ == "__main__":
    main()
