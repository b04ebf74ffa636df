"""Pose-graph optimization CLI.

Mirrors the reference ``pose_graph_g2o`` binary (bin/pose_graph_g2o.rs):
dataset selection (named registry entries, files, or "all"), optimizer
lm/gn/dl/all, 16 loss choices by name, chi^2 (information-weighted) and
unweighted cost metrics, per-dataset summary table, --save-output, and
--profile (jax profiler trace).

Offline fallback: --synthetic ring|manhattan|sphere generates an equivalent
problem when the registry can't download.

Usage:
    python -m apex_tpu.cli.pose_graph --file graph.g2o --optimizer lm
    python -m apex_tpu.cli.pose_graph --synthetic sphere --poses 500
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def build_parser():
    p = argparse.ArgumentParser(
        prog="pose_graph", description="apex-tpu pose graph optimization"
    )
    src = p.add_mutually_exclusive_group(required=True)
    src.add_argument("--file", help="g2o or TORO file path")
    src.add_argument("--dataset", help="named dataset (downloads; see registry)")
    src.add_argument(
        "--synthetic", choices=["ring", "manhattan", "sphere"],
        help="generate a synthetic dataset (offline)",
    )
    p.add_argument("--poses", type=int, default=500, help="synthetic pose count")
    p.add_argument(
        "--optimizer", default="lm", choices=["lm", "gn", "dl", "all"],
        help="optimizer(s) to run",
    )
    p.add_argument("--loss", default="none", help="robust loss by name (or 'none')")
    p.add_argument("--loss-scale", type=float, default=None, help="loss scale parameter")
    p.add_argument(
        "--linear-solver", default="sparse_cholesky",
        choices=["sparse_cholesky", "sparse_qr", "sparse_general",
                 "dense_cholesky", "dense_qr", "pcg"],
        help="linear solver tier (sparse_* ride the RCM band / general-"
             "sparsity elimination; dense tiers for small problems)")
    p.add_argument("--max-iterations", type=int, default=100)
    p.add_argument("--cost-tolerance", type=float, default=1e-4)
    p.add_argument("--fix-first", action="store_true", help="fix the first vertex")
    p.add_argument("--save-output", help="write optimized graph to this g2o path")
    p.add_argument("--profile", action="store_true", help="capture a jax profiler trace")
    p.add_argument("--jit", action="store_true", help="use the fully-jitted solve loop")
    p.add_argument("--verbose", action="store_true", help="per-iteration table")
    p.add_argument("--platform", default=None, help="force jax platform (cpu/tpu)")
    return p


def estimate_dof(args):
    """Cheap DOF estimate WITHOUT touching jax (graph generation/loading
    initializes the backend, so the CPU pin decision must come first)."""
    if args.synthetic:
        return args.poses * (6 if args.synthetic == "sphere" else 3)
    path = args.file
    if args.dataset:
        from apex_tpu.io.datasets import ensure_pose_graph_dataset

        path = ensure_pose_graph_dataset(args.dataset)
    n_se2 = n_se3 = 0
    try:
        with open(path) as f:
            for line in f:
                tag = line.split(maxsplit=1)[0] if line.strip() else ""
                if tag in ("VERTEX_SE2", "VERTEX2"):
                    n_se2 += 1
                elif tag == "VERTEX_SE3:QUAT":
                    n_se3 += 1
    except OSError:
        return 1 << 30  # unreadable: don't pin; the loader will error
    return n_se2 * 3 + n_se3 * 6


def load_graph(args):
    from apex_tpu.io import load_g2o, load_toro, synthetic
    from apex_tpu.io.datasets import ensure_pose_graph_dataset

    if args.synthetic:
        if args.synthetic == "sphere":
            return synthetic.synthetic_pose_graph_3d(n_poses=args.poses), args.synthetic
        return (
            synthetic.synthetic_pose_graph_2d(n_poses=args.poses, trajectory=args.synthetic),
            args.synthetic,
        )
    if args.dataset:
        path = ensure_pose_graph_dataset(args.dataset)
        return load_g2o(path), args.dataset
    path = args.file
    loader = load_toro if str(path).endswith((".toro", ".graph")) else load_g2o
    return loader(path), path


def make_loss(args):
    from apex_tpu.core.losses import LOSS_BY_NAME

    if args.loss == "none":
        return None
    if args.loss not in LOSS_BY_NAME:
        sys.exit(f"unknown loss {args.loss!r}; known: none, {', '.join(sorted(LOSS_BY_NAME))}")
    fn = LOSS_BY_NAME[args.loss]
    return fn(args.loss_scale) if args.loss_scale is not None else fn()


def make_solver(kind, args):
    import apex_tpu as apx

    mode = "jit" if args.jit else "python"
    if kind == "lm":
        return apx.LevenbergMarquardt(
            apx.LevenbergMarquardtConfig(
                linear_solver_type=args.linear_solver,
                max_iterations=args.max_iterations,
                cost_tolerance=args.cost_tolerance,
                mode=mode,
                verbose=args.verbose,
            )
        )
    if kind == "gn":
        return apx.GaussNewton(
            apx.GaussNewtonConfig(
                linear_solver_type=args.linear_solver,
                max_iterations=args.max_iterations,
                cost_tolerance=args.cost_tolerance,
                mode=mode,
                verbose=args.verbose,
            )
        )
    dl_solver = args.linear_solver
    if dl_solver in ("sparse_general", "pcg"):  # not in DogLeg's menu
        dl_solver = "sparse_cholesky"
    return apx.DogLeg(
        apx.DogLegConfig(
            linear_solver_type=dl_solver,
            max_iterations=args.max_iterations,
            cost_tolerance=args.cost_tolerance,
            mode=mode,
            verbose=args.verbose,
        )
    )


def main(argv=None):
    args = build_parser().parse_args(argv)

    from apex_tpu.utils import auto_pin_platform, init_logger

    log = init_logger()

    auto_pin_platform(estimate_dof(args), args.platform, log)
    graph, name = load_graph(args)
    log.info(
        "loaded %s: %d vertices, %d edges (%s)",
        name, graph.num_vertices, graph.num_edges, "SE3" if graph.is_se3 else "SE2",
    )
    loss = make_loss(args)

    optimizers = ["lm", "gn", "dl"] if args.optimizer == "all" else [args.optimizer]
    chi2_before = graph.chi2()
    rows = []
    result = None
    for kind in optimizers:
        solver = make_solver(kind, args)
        problem = graph.to_problem(loss=loss, fix_first=args.fix_first)
        if args.profile:
            import jax

            with jax.profiler.trace("/tmp/apex_tpu_profile"):
                t0 = time.perf_counter()
                result = solver.optimize(problem)
                elapsed = time.perf_counter() - t0
            log.info("profiler trace written to /tmp/apex_tpu_profile")
        else:
            t0 = time.perf_counter()
            result = solver.optimize(problem)
            elapsed = time.perf_counter() - t0
        chi2_after = graph.chi2(result.variables)
        rows.append((kind, result, elapsed, chi2_after))
        log.info("%s: %s", kind, result.summary())

    print(f"\n{'optimizer':>9} {'status':>28} {'iters':>5} {'init cost':>12} "
          f"{'final cost':>12} {'chi2 before':>12} {'chi2 after':>12} {'time':>9}")
    for kind, res, elapsed, chi2_after in rows:
        print(
            f"{kind:>9} {res.status.name:>28} {res.iterations:>5} "
            f"{res.initial_cost:>12.4e} {res.final_cost:>12.4e} "
            f"{chi2_before:>12.4e} {chi2_after:>12.4e} {elapsed*1e3:>8.1f}m"
        )

    if args.save_output and result is not None:
        vertices = graph.vertices_se3 if graph.is_se3 else graph.vertices_se2
        for vid in vertices:
            vertices[vid] = np.asarray(result.variables[f"x{vid}"])
        from apex_tpu.io import save_g2o

        save_g2o(args.save_output, graph)
        log.info("optimized graph written to %s", args.save_output)
    return 0


if __name__ == "__main__":
    sys.exit(main())
