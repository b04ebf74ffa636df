"""Compare linear solvers on the same problem (reference:
examples/compare_solvers.rs).

Runs LM with dense Cholesky / dense QR / explicit Schur / implicit Schur on
a synthetic BA problem and prints a comparison table.
"""

import sys
import time

sys.path.insert(0, ".")

import jax

jax.config.update("jax_platforms", jax.default_backend())

import apex_tpu as apx
from apex_tpu.ba import build_ba_problem, rmse
from apex_tpu.io import synthetic


def main():
    ds = synthetic.synthetic_ba(n_cameras=12, n_points=300, seed=0)
    print(f"BA problem: {ds.num_cameras} cams, {ds.num_points} pts, "
          f"{ds.num_observations} obs\n")

    rows = []
    for solver in ["dense_cholesky", "dense_qr", "schur_explicit", "schur_implicit"]:
        problem = build_ba_problem(ds)
        cfg = apx.LevenbergMarquardtConfig(linear_solver_type=solver, max_iterations=30)
        t0 = time.perf_counter()
        res = apx.LevenbergMarquardt(cfg).optimize(problem)
        dt = time.perf_counter() - t0
        rows.append((solver, res, dt))

    print(f"{'solver':>16} {'status':>26} {'iters':>5} {'final cost':>12} "
          f"{'RMSE px':>8} {'time':>8}")
    for solver, res, dt in rows:
        print(f"{solver:>16} {res.status.name:>26} {res.iterations:>5} "
              f"{res.final_cost:>12.4e} {rmse(res.final_cost, ds.num_observations):>8.3f} "
              f"{dt:>7.2f}s")


if __name__ == "__main__":
    main()
