"""Cubicle solver-tier shootout (VERDICT r3 weak #5).

The cubicle-scale graph (5,750 poses, ~17.2k edges, ~3 edges/vertex via
closure_strides=(1,2)) is the thinnest pose margin (1.95x driver). Its
2-ring closures widen the RCM band; this harness times each applicable
linear-solver tier on the same graph so the default choice is evidence,
not habit.

Usage: python benches/tpu_cubicle_tiers.py [--runs 3]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

# Reference wall time for the real cubicle dataset: 512.0 ms / 5 LM iters,
# measured by the upstream project on an Apple M4 Mac Mini
# (/root/reference/doc/performance.md:71; mirrored in BASELINE.md).
CUBICLE_BASELINE_MS = 512.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()

    import numpy as np

    import apex_tpu as apx
    from apex_tpu.io import synthetic

    g = synthetic.synthetic_pose_graph_3d(
        n_poses=5750, rings=230, seed=0, closure_strides=(1, 2))
    print(f"# cubicle-scale: {g.num_vertices} vertices {g.num_edges} edges",
          flush=True)
    cp = g.to_problem().compile(dtype=np.float32)

    for solver in ["sparse_cholesky", "sparse_general", "sparse_qr"]:
        try:
            cfg = apx.LevenbergMarquardtConfig(
                mode="jit", max_iterations=100, cost_tolerance=1e-4,
                linear_solver_type=solver, damping="auto")
            lm = apx.LevenbergMarquardt(cfg)
            t0 = time.perf_counter()
            result = lm.optimize(cp)
            warm = time.perf_counter() - t0
            best = float("inf")
            for _ in range(args.runs):
                t0 = time.perf_counter()
                result = lm.optimize(cp)
                best = min(best, time.perf_counter() - t0)
            ms = best * 1e3
            print(f"{solver:>16}: {result.status.name} {result.iterations} "
                  f"iters cost->{result.final_cost:.3e} warm {warm:.1f}s "
                  f"best {ms:.1f} ms ({ms / max(result.iterations, 1):.1f} "
                  f"ms/iter, {CUBICLE_BASELINE_MS / ms:.2f}x baseline)",
                  flush=True)
        except Exception as e:  # noqa: BLE001 - shootout keeps going
            print(f"{solver:>16}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)


if __name__ == "__main__":
    main()
