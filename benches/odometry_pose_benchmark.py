"""Pose-graph optimization benchmark harness.

Mirrors the reference benches/odometry_pose_benchmark.rs: runs the solver
over a suite of pose-graph datasets and writes a CSV (the reference's
criterion + CSV interchange pattern). Datasets come from the registry when
the network allows, otherwise synthetic equivalents are generated at the
same scales (BASELINE.md table).

Usage: python benches/odometry_pose_benchmark.py [--out results.csv]
       [--datasets ring intel ...] [--optimizer lm|gn|dl] [--dtype f32|f64]
"""

import argparse
import csv
import sys
import time

sys.path.insert(0, ".")

# Scale-matched synthetic stand-ins for the reference datasets
# (name -> (manifold, n_poses, extra kwargs)).
SUITE = {
    "ring": ("SE2", dict(n_poses=434, trajectory="ring")),
    "intel": ("SE2", dict(n_poses=1228, trajectory="manhattan", loop_stride=15)),
    "M3500": ("SE2", dict(n_poses=3500, trajectory="manhattan", loop_stride=12)),
    "mit": ("SE2", dict(n_poses=808, trajectory="manhattan", loop_stride=40)),
    "sphere2500": ("SE3", dict(n_poses=2500, rings=50)),
    "parking-garage": ("SE3", dict(n_poses=1661, rings=30,
                                   closure_strides=(1, 2, 3))),  # 6,313 edges ~ real 6,275
    "torus3D": ("SE3", dict(n_poses=5000, rings=100)),  # matches bench.py rung (9,949 edges)
    "cubicle": ("SE3", dict(n_poses=5750, rings=230, closure_strides=(1, 2))),
}

# Reference wall times in ms (BASELINE.md, M4 Mac Mini).
BASELINE_MS = {
    "ring": 8.5, "intel": 28.5, "M3500": 103.5, "mit": 140.7,
    "sphere2500": 176.3, "parking-garage": 153.1, "torus3D": 1780.5,
    "cubicle": 512.0,
}


def load_dataset(name):
    from apex_tpu.io import load_g2o, synthetic
    from apex_tpu.io.datasets import ensure_pose_graph_dataset

    try:
        return load_g2o(ensure_pose_graph_dataset(name)), "real"
    except Exception:
        manifold, kw = SUITE[name]
        gen = (synthetic.synthetic_pose_graph_2d if manifold == "SE2"
               else synthetic.synthetic_pose_graph_3d)
        return gen(seed=0, **kw), "synthetic"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="odometry_benchmark_results.csv")
    ap.add_argument("--datasets", nargs="+", default=list(SUITE))
    ap.add_argument("--optimizer", default="lm", choices=["lm", "gn", "dl"])
    ap.add_argument("--dtype", default="f64", choices=["f32", "f64"])
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--platform", default=None,
                    help="'cpu' forces the cpu backend; any OTHER value is an "
                         "assertion only (exits if the detected default "
                         "backend differs — never force-removes cpu, the "
                         "synthetic generators need it alive). Small SE2 "
                         "graphs are latency-bound on a remote-tunnel TPU, so "
                         "committed artifacts record the platform used")
    args = ap.parse_args()

    import numpy as np

    import jax

    if args.platform == "cpu":
        # Forcing only makes sense toward CPU (the synthetic generators
        # need the cpu backend alive, so never *remove* it); any other
        # value is a label assertion against the detected backend.
        jax.config.update("jax_platforms", "cpu")
    platform = jax.default_backend()
    if args.platform and args.platform != platform:
        raise SystemExit(f"requested platform {args.platform!r} but "
                         f"default backend is {platform!r}")

    import apex_tpu as apx

    dtype = np.float32 if args.dtype == "f32" else np.float64
    rows = []
    for name in args.datasets:
        g, source = load_dataset(name)
        cp = g.to_problem().compile(dtype=dtype)
        cls, ccls = {
            "lm": (apx.LevenbergMarquardt, apx.LevenbergMarquardtConfig),
            "gn": (apx.GaussNewton, apx.GaussNewtonConfig),
            "dl": (apx.DogLeg, apx.DogLegConfig),
        }[args.optimizer]
        kw = dict(max_iterations=100, cost_tolerance=1e-4, mode="jit",
                  linear_solver_type="sparse_cholesky")
        if args.optimizer == "lm":
            kw["damping"] = "auto"  # Madsen-Nielsen, same as the bench rungs
        solver = cls(ccls(**kw))
        result = solver.optimize(cp)  # warmup/compile
        best = float("inf")
        for _ in range(args.runs):
            t0 = time.perf_counter()
            result = solver.optimize(cp)
            best = min(best, time.perf_counter() - t0)
        ms = best * 1e3
        speedup = BASELINE_MS.get(name, float("nan")) / ms
        rows.append(dict(
            dataset=name, source=source, vertices=g.num_vertices,
            edges=g.num_edges, optimizer=args.optimizer, dtype=args.dtype,
            platform=platform,
            # self-describing solver config (ADVICE r4): BASELINE_MS was
            # measured by the reference under ITS defaults; rows must say
            # what config produced the apex number.
            linear_solver=kw["linear_solver_type"],
            damping=kw.get("damping", "fixed"),
            status=result.status.name, iterations=result.iterations,
            initial_cost=result.initial_cost, final_cost=result.final_cost,
            time_ms=round(ms, 2), baseline_ms=BASELINE_MS.get(name),
            vs_baseline=round(speedup, 3),
        ))
        print(f"{name:>16} [{source}]: {result.status.name} {result.iterations} iters "
              f"cost {result.initial_cost:.3e} -> {result.final_cost:.3e} "
              f"{ms:.1f} ms ({speedup:.2f}x baseline)")

    with open(args.out, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
        w.writeheader()
        w.writerows(rows)
    print(f"\nresults written to {args.out}")


if __name__ == "__main__":
    main()
