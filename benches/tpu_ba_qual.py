"""TPU bundle-adjustment qualification ladder.

Runs BA at increasing scale on the default device (TPU when available)
and records wall time / RMSE per scale. Used to produce the numbers in
doc/performance.md and to verify the >=160k-observation TPU runtime
qualification (VERDICT round-1 item 2).

Usage: python benches/tpu_ba_qual.py [scale ...]
  scales: ladybug49 ladybug400 ladybug1723 venice
"""

import sys
import time

sys.path.insert(0, ".")

SCALES = {
    # name -> (generator, kwargs)
    "ladybug49": ("small", dict(n_cameras=49, n_points=7776)),
    "ladybug400": ("large", dict(n_cameras=400, n_points=40000, obs_per_camera=400)),
    "ladybug1723": ("large", dict(n_cameras=1723, n_points=156502, obs_per_camera=394)),
    "venice": ("large", dict(n_cameras=1778, n_points=993923, obs_per_camera=2813)),
}


def run(name, solver="implicit", dtype_name="f32", max_iterations=30):
    import numpy as np

    import apex_tpu as apx
    from apex_tpu.ba import build_ba_problem, rmse
    from apex_tpu.io import synthetic

    gen, kw = SCALES[name]
    t0 = time.perf_counter()
    if gen == "small":
        ds = synthetic.synthetic_ba(**kw)
    else:
        ds = synthetic.synthetic_ba_large(**kw)
    gen_s = time.perf_counter() - t0
    print(f"[{name}] generated: {len(ds.cam_indices)} obs in {gen_s:.1f}s",
          flush=True)

    t0 = time.perf_counter()
    problem = build_ba_problem(ds, mode="self_calibration")
    dtype = np.float32 if dtype_name == "f32" else np.float64
    cp = problem.compile(dtype=dtype)
    build_s = time.perf_counter() - t0
    print(f"[{name}] compiled problem in {build_s:.1f}s", flush=True)

    cfg = apx.LevenbergMarquardtConfig(
        linear_solver_type=f"schur_{solver}",
        schur_preconditioner="schur_jacobi",
        max_iterations=max_iterations,
        mode="jit",
    )
    lm = apx.LevenbergMarquardt(cfg)
    t0 = time.perf_counter()
    result = lm.optimize(cp)  # compile + first run
    cold_s = time.perf_counter() - t0
    r0 = rmse(result.initial_cost, ds.num_observations)
    r1 = rmse(result.final_cost, ds.num_observations)
    print(f"[{name}] cold {cold_s:.1f}s: {result.summary()} "
          f"RMSE {r0:.3f} -> {r1:.3f} px", flush=True)

    t0 = time.perf_counter()
    result = lm.optimize(cp)
    warm_s = time.perf_counter() - t0
    print(f"[{name}] WARM {warm_s:.2f}s ({warm_s / max(result.iterations, 1) * 1e3:.0f} "
          f"ms/LM-iter, {result.iterations} iters) solver={solver} dtype={dtype_name}",
          flush=True)
    return warm_s, float(r1)


if __name__ == "__main__":
    names = sys.argv[1:] or ["ladybug49"]
    for n in names:
        solver = "implicit"
        if ":" in n:
            n, solver = n.split(":")
        if n.startswith("custom"):
            # custom-C-P-OPC: e.g. custom-1723-156502-250
            _, c, p, opc = n.split("-")
            SCALES[n] = ("large", dict(
                n_cameras=int(c), n_points=int(p), obs_per_camera=int(opc)))
        run(n, solver=solver)
