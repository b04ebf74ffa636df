"""Load, inspect, and optimize a g2o/TORO graph file (reference:
examples/load_graph_file.rs). Usage: python examples/load_graph_file.py
[path.g2o] — generates a synthetic file if no path is given."""

import sys

sys.path.insert(0, ".")

import apex_tpu as apx
from apex_tpu.io import load_g2o, save_g2o, synthetic


def main():
    if len(sys.argv) > 1:
        path = sys.argv[1]
    else:
        path = "/tmp/example_graph.g2o"
        save_g2o(path, synthetic.synthetic_pose_graph_2d(n_poses=100, seed=7))
        print(f"(generated synthetic graph at {path})")

    g = load_g2o(path)
    kind = "SE3" if g.is_se3 else "SE2"
    print(f"{path}: {g.num_vertices} {kind} vertices, {g.num_edges} edges")
    print(f"chi2 before: {g.chi2():.6e}")

    res = apx.LevenbergMarquardt().optimize(g.to_problem())
    print(res.summary())
    print(f"chi2 after: {g.chi2(res.variables):.6e}")


if __name__ == "__main__":
    main()
