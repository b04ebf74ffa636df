"""Venice deep-quality rung: reproducibility capture + per-iteration sweep
(VERDICT r4 item 5).

Round 4 recorded a 2.5x swing on the headline rung: the driver's capture
crossed the 0.46 px gate in 2 LM iterations / 3.7 s, the builder's sweep
the same week took 5 iterations / 8.0 s. Mechanism candidates: true
run-to-run nondeterminism, or cross-day backend/libtpu numerics drift
(the same class that flipped m3500's iteration count in round 3).

This harness settles it empirically on one backend day:

1. the EXACT bench.py deep-quality rung (0.3 px synthetic, stop at
   RMSE <= 0.46 px), run N consecutive warm times, printing the
   iteration count and wall time of EVERY run (bench.py's best-of hides
   the spread);
2. a full fixed-iteration sweep in python mode with per-iteration stats:
   the (iter, RMSE, cumulative seconds) milestones behind the
   doc/performance.md venice-deep table.

Usage: python benches/tpu_venice_repro.py [--repeats 4] [--sweep-iters 11]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeats", type=int, default=4)
    ap.add_argument("--sweep-iters", type=int, default=11)
    ap.add_argument("--skip-sweep", action="store_true")
    ap.add_argument("--skip-gate", action="store_true",
                    help="run only the per-iteration sweep (the gate rung's "
                         "jit-mode executable costs a ~29 min cold compile)")
    args = ap.parse_args()

    import numpy as np

    import apex_tpu as apx
    from apex_tpu.ba import build_ba_problem, rmse
    from apex_tpu.io import synthetic

    t0 = time.perf_counter()
    ds = synthetic.synthetic_ba_large(
        n_cameras=1778, n_points=993_923, obs_per_camera=2813,
        pixel_noise=0.3, seed=0)
    cp = build_ba_problem(ds, mode="self_calibration").compile(
        dtype=np.float32)
    print(f"# built 5.0M-obs problem in {time.perf_counter() - t0:.0f}s",
          flush=True)

    # 1. gate-rung repeats (identical config to bench.py's venice rung)
    if args.skip_gate:
        _sweep(args, ds, cp)
        return
    target_cost = (0.46 ** 2) * ds.num_observations
    cfg = apx.LevenbergMarquardtConfig(
        linear_solver_type="schur_implicit",
        schur_preconditioner="schur_jacobi",
        max_iterations=8, mode="jit", pcg_max_iterations=15,
        min_cost_threshold=target_cost)
    lm = apx.LevenbergMarquardt(cfg)
    t0 = time.perf_counter()
    res = lm.optimize(cp)
    print(f"# cold (compile+run): {time.perf_counter() - t0:.0f}s "
          f"{res.iterations} iters", flush=True)
    iters = []
    for k in range(args.repeats):
        t0 = time.perf_counter()
        res = lm.optimize(cp)
        dt = time.perf_counter() - t0
        r1 = rmse(res.final_cost, ds.num_observations)
        iters.append(res.iterations)
        print(f"gate run {k}: {res.iterations} LM iters, {dt:.2f} s, "
              f"final RMSE {r1:.3f} px ({83.17 / dt:.1f}x baseline)",
              flush=True)
    spread = max(iters) - min(iters)
    print(f"# iteration spread across {args.repeats} consecutive warm runs: "
          f"{spread} (pinned = within +-1)", flush=True)

    if args.skip_sweep:
        return
    _sweep(args, ds, cp)


def _sweep(args, ds, cp):
    """Fixed-iteration sweep with per-iteration milestones."""
    import apex_tpu as apx
    from apex_tpu.ba import rmse

    cfg2 = apx.LevenbergMarquardtConfig(
        linear_solver_type="schur_implicit",
        schur_preconditioner="schur_jacobi",
        max_iterations=args.sweep_iters, mode="python",
        pcg_max_iterations=15, cost_tolerance=1e-6,
        collect_stats=True)
    lm2 = apx.LevenbergMarquardt(cfg2)
    lm2.optimize(cp)  # warm the per-step executable
    res = lm2.optimize(cp)
    print("# venice-deep sweep (warm, python-mode per-iteration stats):",
          flush=True)
    print("iter  RMSE(px)  cum_s", flush=True)
    for st in res.iteration_stats:
        print(f"{st.iteration:4d}  {rmse(st.cost, ds.num_observations):7.3f}"
              f"  {st.total_time_ms / 1e3:6.2f}", flush=True)


if __name__ == "__main__":
    main()
