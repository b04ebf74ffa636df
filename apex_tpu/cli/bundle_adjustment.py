"""Bundle adjustment CLI.

Mirrors the reference ``bundle_adjustment`` binary (bin/bundle_adjustment
.rs): BAL file or named dataset (auto-download), -n point limit, --solver
explicit|implicit, --type with the 5 optimization modes, HuberLoss(1.0)
default, first camera fixed for gauge, RMSE = sqrt(cost/N) reporting.

Offline fallback: --synthetic with --cameras/--points generates an
equivalent Snavely-convention problem.

Usage:
    python -m apex_tpu.cli.bundle_adjustment --file problem.txt --solver implicit
    python -m apex_tpu.cli.bundle_adjustment --synthetic --cameras 20 --points 500
"""

from __future__ import annotations

import argparse
import sys
import time


def build_parser():
    p = argparse.ArgumentParser(
        prog="bundle_adjustment", description="apex-tpu bundle adjustment"
    )
    src = p.add_mutually_exclusive_group(required=True)
    src.add_argument("--file", help="BAL problem file")
    src.add_argument("--dataset", help="named BAL dataset (downloads)")
    src.add_argument("--synthetic", action="store_true", help="synthetic BA (offline)")
    p.add_argument("--cameras", type=int, default=20, help="synthetic camera count")
    p.add_argument("--points", type=int, default=500, help="synthetic point count")
    p.add_argument("-n", "--max-points", type=int, default=None, help="limit points")
    p.add_argument("--solver", default="implicit", choices=["explicit", "implicit", "dense"])
    p.add_argument(
        "--type", dest="mode", default="self_calibration",
        choices=[
            "bundle_adjustment", "self_calibration", "only_pose",
            "only_landmarks", "only_intrinsics",
        ],
    )
    p.add_argument("--loss", default="huber", help="robust loss (or 'none')")
    p.add_argument("--loss-scale", type=float, default=1.0)
    p.add_argument("--max-iterations", type=int, default=20)
    p.add_argument("--pcg-tolerance", type=float, default=1e-6)
    p.add_argument("--pcg-max-iterations", type=int, default=200)
    p.add_argument("--jit", action="store_true")
    p.add_argument("--verbose", action="store_true")
    p.add_argument("--platform", default=None)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)

    import apex_tpu as apx
    from apex_tpu.ba import build_ba_problem, rmse
    from apex_tpu.core.losses import LOSS_BY_NAME
    from apex_tpu.io import load_bal, synthetic
    from apex_tpu.io.datasets import ensure_ba_dataset
    from apex_tpu.utils import auto_pin_platform, init_logger

    log = init_logger()

    # Pin BEFORE loading/generating (those paths touch jax and would
    # commit the backend). BAL headers carry the sizes on line one;
    # synthetic sizes come from the flags.
    if args.synthetic:
        n_cams, n_pts = args.cameras, args.points
    else:
        path = ensure_ba_dataset(args.dataset) if args.dataset else args.file
        try:
            with open(path) as f:
                n_cams, n_pts, _ = (int(t) for t in f.readline().split()[:3])
        except (OSError, ValueError):
            n_cams, n_pts = 1 << 20, 1 << 20  # unparseable: don't pin
    if args.max_points is not None:
        n_pts = min(args.max_points, n_pts)
    auto_pin_platform(n_cams * 9 + n_pts * 3, args.platform, log)

    if args.synthetic:
        ds = synthetic.synthetic_ba(n_cameras=args.cameras, n_points=args.points)
    elif args.dataset:
        ds = load_bal(ensure_ba_dataset(args.dataset))
    else:
        ds = load_bal(args.file)
    log.info(
        "BA problem: %d cameras, %d points, %d observations",
        ds.num_cameras, ds.num_points, ds.num_observations,
    )

    loss = None if args.loss == "none" else LOSS_BY_NAME[args.loss](args.loss_scale)
    problem = build_ba_problem(ds, mode=args.mode, loss=loss, max_points=args.max_points)

    solver_type = {
        "implicit": "schur_implicit",
        "explicit": "schur_explicit",
        "dense": "dense_cholesky",
    }[args.solver]
    from apex_tpu.factors.projection import OPTIMIZE_MODES

    if "landmark" not in OPTIMIZE_MODES[args.mode] and solver_type != "dense_cholesky":
        log.info("mode %s has no landmark block to eliminate; using dense solver", args.mode)
        solver_type = "dense_cholesky"
    cfg = apx.LevenbergMarquardtConfig(
        linear_solver_type=solver_type,
        schur_preconditioner="schur_jacobi",
        max_iterations=args.max_iterations,
        pcg_tolerance=args.pcg_tolerance,
        pcg_max_iterations=args.pcg_max_iterations,
        mode="jit" if args.jit else "python",
        verbose=args.verbose,
    )
    t0 = time.perf_counter()
    result = apx.LevenbergMarquardt(cfg).optimize(problem)
    elapsed = time.perf_counter() - t0

    if args.max_points is None:
        n_obs = ds.num_observations
    else:
        n_obs = int((ds.point_indices < args.max_points).sum())

    print()
    print("Optimization completed!")
    print(f"Status: {result.status.name}")
    print(f"Iterations: {result.iterations}")
    print(f"Time: {elapsed:.2f} seconds")
    print()
    print("Metrics:")
    print(f"  Initial cost: {result.initial_cost:.6e}")
    print(f"  Final cost: {result.final_cost:.6e}")
    print(f"  Initial RMSE: {rmse(result.initial_cost, n_obs):.3f} pixels")
    print(f"  Final RMSE: {rmse(result.final_cost, n_obs):.3f} pixels")
    imp = (result.initial_cost - result.final_cost) / max(result.initial_cost, 1e-300) * 100
    print(f"  Improvement: {imp:.2f}%")
    return 0


if __name__ == "__main__":
    sys.exit(main())
