"""Venice-scale BA on one TPU chip — the north-star benchmark.

Reference: venice-1778 (1,778 cams / 993,923 landmarks / 5,001,946 obs)
solves in 83.17 s on an M4 Mac Mini (BASELINE.md); Ceres and GTSAM time
out. Target: >=5x (<= 16.6 s steady-state) on one chip.

Usage: python benches/tpu_venice.py [max_iterations] [obs_per_camera]
"""

import sys
import time

sys.path.insert(0, ".")


def main():
    import numpy as np

    import apex_tpu as apx
    from apex_tpu.ba import build_ba_problem, rmse
    from apex_tpu.io import synthetic

    max_it = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    opc = int(sys.argv[2]) if len(sys.argv) > 2 else 2813

    t0 = time.perf_counter()
    ds = synthetic.synthetic_ba_large(
        n_cameras=1778, n_points=993_923, obs_per_camera=opc, seed=0)
    print(f"gen {len(ds.cam_indices)} obs in {time.perf_counter()-t0:.0f}s",
          flush=True)

    t0 = time.perf_counter()
    problem = build_ba_problem(ds, mode="self_calibration")
    cp = problem.compile(dtype=np.float32)
    print(f"problem build+plans {time.perf_counter()-t0:.0f}s", flush=True)

    cfg = apx.LevenbergMarquardtConfig(
        linear_solver_type="schur_implicit", schur_preconditioner="schur_jacobi",
        max_iterations=max_it, mode="jit",
    )
    lm = apx.LevenbergMarquardt(cfg)

    t0 = time.perf_counter()
    res = lm.optimize(cp)  # compile + first run
    cold = time.perf_counter() - t0
    r0 = rmse(res.initial_cost, ds.num_observations)
    r1 = rmse(res.final_cost, ds.num_observations)
    print(f"COLD {cold:.0f}s: {res.summary()} RMSE {r0:.3f} -> {r1:.3f} px",
          flush=True)

    t0 = time.perf_counter()
    res = lm.optimize(cp)
    warm = time.perf_counter() - t0
    print(f"WARM {warm:.1f}s ({warm/max(res.iterations,1):.2f} s/LM-iter, "
          f"{res.iterations} iters) vs baseline 83.17 s -> "
          f"{83.17/warm:.2f}x", flush=True)


if __name__ == "__main__":
    main()
