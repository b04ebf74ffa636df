"""Stream optimization progress to Rerun (reference:
examples/visualize_optimization.rs). Requires the optional rerun-sdk;
falls back to a HistoryObserver dump when it's missing."""

import sys

sys.path.insert(0, ".")

import apex_tpu as apx
from apex_tpu.io import synthetic
from apex_tpu.observers import HistoryObserver


def main():
    g = synthetic.synthetic_pose_graph_3d(n_poses=150, rings=6, seed=0)
    lm = apx.LevenbergMarquardt()

    try:
        from apex_tpu.observers import RerunObserver, VisualizationConfig

        obs = RerunObserver(VisualizationConfig.for_pose_graph())
        print("streaming to rerun viewer")
    except ImportError:
        obs = HistoryObserver()
        print("rerun-sdk not installed; recording metrics with HistoryObserver")

    lm.add_observer(obs)
    res = lm.optimize(g.to_problem())
    print(res.summary())
    if isinstance(obs, HistoryObserver):
        print("cost curve:", [f"{c:.3e}" for c in obs.costs])


if __name__ == "__main__":
    main()
