"""Compare LM / Gauss-Newton / DogLeg on a pose graph (reference:
examples/compare_optimizers.rs)."""

import sys
import time

sys.path.insert(0, ".")

import apex_tpu as apx
from apex_tpu.io import synthetic


def main():
    g = synthetic.synthetic_pose_graph_3d(n_poses=200, rings=8, seed=0)
    print(f"pose graph: {g.num_vertices} vertices, {g.num_edges} edges\n")

    solvers = [
        ("LM", apx.LevenbergMarquardt()),
        ("GN", apx.GaussNewton()),
        ("DogLeg", apx.DogLeg()),
    ]
    print(f"{'optimizer':>9} {'status':>26} {'iters':>5} {'init cost':>11} "
          f"{'final cost':>11} {'time':>8}")
    for name, solver in solvers:
        t0 = time.perf_counter()
        res = solver.optimize(g.to_problem())
        dt = time.perf_counter() - t0
        print(f"{name:>9} {res.status.name:>26} {res.iterations:>5} "
              f"{res.initial_cost:>11.4e} {res.final_cost:>11.4e} {dt:>7.2f}s")


if __name__ == "__main__":
    main()
