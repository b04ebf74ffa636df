"""grid3D 20^3 TPU capture (VERDICT r3 item 4).

Runs the general-sparsity independent-set elimination tier on a
20x20x20 grid3D SE3 graph (8,000 vertices / 48k DOF / ~22.8k edges —
the reference registry's high-treewidth shape, scaled up to where the
dense separator core is MXU-bound) and compares its per-LM-iteration
cost to an equal-vertex-count trajectory graph solved by the banded
tier. Round-3 target: per-iter ratio <= 3x.

Usage: [APEX_GRID_N=20] python benches/tpu_grid20.py
"""

import os
import sys
import time

sys.path.insert(0, ".")


def solve(graph, solver, dtype, runs=2, min_reduction=0.5):
    import apex_tpu as apx

    cfg = apx.LevenbergMarquardtConfig(
        mode="jit", max_iterations=100, cost_tolerance=1e-4,
        linear_solver_type=solver, damping="auto")
    lm = apx.LevenbergMarquardt(cfg)
    cp = graph.to_problem().compile(dtype=dtype)
    t0 = time.perf_counter()
    result = lm.optimize(cp)
    warm = time.perf_counter() - t0
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        result = lm.optimize(cp)
        best = min(best, time.perf_counter() - t0)
    # hard gates (not `assert` — stripped under python -O, which would turn
    # the capture harness into a silent pass; ADVICE r4)
    if not result.converged:
        raise SystemExit(f"FAILED convergence gate: {result.summary()}")
    if not result.final_cost < (1 - min_reduction) * result.initial_cost:
        raise SystemExit(
            f"FAILED cost-reduction gate: {result.initial_cost:.3e} -> "
            f"{result.final_cost:.3e} (needed x{1 - min_reduction:.2f})")
    return best, warm, result


def main():
    import numpy as np

    from apex_tpu.io import synthetic

    n = int(os.environ.get("APEX_GRID_N", "20"))
    dtype = np.float32
    print(f"# generating grid3D {n}^3 ...", flush=True)
    g = synthetic.synthetic_pose_graph_grid3d(nx=n, ny=n, nz=n, seed=0)
    print(f"# grid: {g.num_vertices} vertices {g.num_edges} edges", flush=True)

    best, warm, res = solve(g, "sparse_general", dtype)
    per_iter = best / max(res.iterations, 1)
    print(f"# grid{n}: {res.summary()} | warmup {warm:.1f}s "
          f"best {best:.2f}s ({per_iter * 1e3:.1f} ms/LM-iter)", flush=True)

    gt = synthetic.synthetic_pose_graph_3d(
        n_poses=g.num_vertices, rings=max(2, g.num_vertices // 80), seed=0)
    best_t, warm_t, res_t = solve(gt, "sparse_cholesky", dtype,
                                  min_reduction=0.95)
    per_iter_t = best_t / max(res_t.iterations, 1)
    print(f"# trajectory-{gt.num_vertices}: {res_t.summary()} | warmup "
          f"{warm_t:.1f}s best {best_t:.2f}s "
          f"({per_iter_t * 1e3:.1f} ms/LM-iter)", flush=True)
    print(f"# per-LM-iter ratio general/banded = {per_iter / per_iter_t:.2f}x "
          f"(target <= 3x)", flush=True)


if __name__ == "__main__":
    main()
