"""Visualize a pose graph file (reference: examples/visualize_graph_file.rs).

Streams the graph to Rerun when the SDK is installed; otherwise prints an
ASCII summary of the trajectory extent.
Usage: python examples/visualize_graph_file.py [path.g2o]
"""

import sys

sys.path.insert(0, ".")

import numpy as np

from apex_tpu.io import load_g2o, save_g2o, synthetic


def main():
    if len(sys.argv) > 1:
        path = sys.argv[1]
    else:
        path = "/tmp/example_vis.g2o"
        save_g2o(path, synthetic.synthetic_pose_graph_3d(n_poses=150, rings=6))
        print(f"(generated synthetic graph at {path})")
    g = load_g2o(path)
    verts = g.vertices_se3 if g.is_se3 else g.vertices_se2
    pts = np.stack([verts[k][:3 if g.is_se3 else 2] for k in sorted(verts)])
    print(f"{path}: {g.num_vertices} vertices, {g.num_edges} edges")
    print(f"extent: min {pts.min(axis=0)} max {pts.max(axis=0)}")

    try:
        import rerun as rr

        rr.init("apex_tpu_graph", spawn=True)
        if g.is_se3:
            rr.log("graph/vertices", rr.Points3D(pts))
        else:
            rr.log("graph/vertices", rr.Points3D(
                np.concatenate([pts, np.zeros((len(pts), 1))], axis=1)))
        print("streamed to rerun viewer")
    except ImportError:
        print("(rerun-sdk not installed; summary only)")


if __name__ == "__main__":
    main()
