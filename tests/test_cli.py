"""CLI smoke tests driving the argparse entry points in-process."""

import numpy as np
import pytest


def test_pose_graph_cli(tmp_path, capsys):
    from apex_tpu.cli.pose_graph import main

    out = tmp_path / "opt.g2o"
    rc = main(["--synthetic", "ring", "--poses", "40", "--optimizer", "lm",
               "--save-output", str(out)])
    assert rc == 0
    assert out.exists()
    cap = capsys.readouterr().out
    assert "COST_TOLERANCE" in cap or "TOLERANCE" in cap


def test_pose_graph_cli_loss(capsys):
    from apex_tpu.cli.pose_graph import main

    rc = main(["--synthetic", "ring", "--poses", "30", "--loss", "huber",
               "--loss-scale", "1.0"])
    assert rc == 0


def test_bundle_adjustment_cli(capsys):
    from apex_tpu.cli.bundle_adjustment import main

    rc = main(["--synthetic", "--cameras", "6", "--points", "80",
               "--solver", "implicit", "--max-iterations", "10"])
    assert rc == 0
    cap = capsys.readouterr().out
    assert "Final RMSE" in cap


def test_bag_tools_cli(tmp_path, capsys):
    from apex_tpu.cli.bag_tools import main

    bag = tmp_path / "bag"
    assert main(["write-dummy", str(bag), "--count", "5"]) == 0
    assert main(["info", str(bag)]) == 0
    out = tmp_path / "f"
    assert main(["filter", str(bag), str(out), "--topics", "/odom"]) == 0
    csvp = tmp_path / "x.csv"
    assert main(["extract", str(out), "--topic", "/odom", "--out", str(csvp)]) == 0
    assert csvp.exists()


def test_download_datasets_cli_list(capsys):
    from apex_tpu.cli.download_datasets import main

    assert main(["--list"]) == 0
    cap = capsys.readouterr().out
    assert "sphere2500" in cap and "ladybug-49" in cap


def test_solver_type_aliases():
    import apex_tpu as apx
    from apex_tpu.io import synthetic

    g = synthetic.synthetic_pose_graph_2d(n_poses=25, seed=30)
    for alias in ("sparse_cholesky", "sparse_qr"):
        cfg = apx.LevenbergMarquardtConfig(linear_solver_type=alias)
        res = apx.LevenbergMarquardt(cfg).optimize(g.to_problem())
        assert res.converged, (alias, res.status)
