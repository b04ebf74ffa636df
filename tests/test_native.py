"""Native C++ parser tier: availability, equivalence with the Python
parsers, malformed-file errors."""

import numpy as np
import pytest

from apex_tpu.io import load_bal, load_g2o, save_bal, save_g2o, synthetic
from apex_tpu.io.g2o import _load_g2o_python
from apex_tpu.native import load_library, parse_bal_native, parse_g2o_native

native_available = load_library() is not None
needs_native = pytest.mark.skipif(not native_available, reason="no g++ toolchain")


@needs_native
def test_g2o_native_matches_python(tmp_path):
    g = synthetic.synthetic_pose_graph_2d(n_poses=50, seed=1)
    p = tmp_path / "a.g2o"
    save_g2o(p, g)
    g1 = load_g2o(p)
    g2 = _load_g2o_python(p)
    assert g1.num_vertices == g2.num_vertices
    assert g1.num_edges == g2.num_edges
    for i in range(50):
        np.testing.assert_allclose(g1.vertices_se2[i], g2.vertices_se2[i], atol=1e-15)
    for a, b in zip(g1.edges_se2, g2.edges_se2):
        np.testing.assert_allclose(a.measurement, b.measurement, atol=1e-15)
        np.testing.assert_allclose(a.information, b.information, atol=1e-15)


@needs_native
def test_g2o_native_se3_and_comments(tmp_path):
    p = tmp_path / "c.g2o"
    p.write_text(
        "# a comment\n"
        "VERTEX_SE3:QUAT 0 1.0 2.0 3.0 0.0 0.0 0.0 1.0\n"
        "UNKNOWN_TAG foo bar\n"
        "VERTEX_SE3:QUAT 1 4.0 5.0 6.0 0.0 0.0 0.0 1.0\n"
        "EDGE_SE3:QUAT 0 1 3.0 3.0 3.0 0.0 0.0 0.0 1.0 "
        + " ".join(["1.0" if i in (0, 6, 11, 15, 18, 20) else "0.0" for i in range(21)])
        + "\n"
    )
    g = load_g2o(p)
    assert g.num_vertices == 2 and g.num_edges == 1
    np.testing.assert_allclose(g.vertices_se3[1][:3], [4.0, 5.0, 6.0])
    np.testing.assert_allclose(g.edges_se3[0].information, np.eye(6))


@needs_native
def test_bal_native_matches_arrays(tmp_path):
    ds = synthetic.synthetic_ba(n_cameras=6, n_points=100, seed=2)
    p = tmp_path / "b.bal"
    save_bal(p, ds)
    obs, cams, pts = parse_bal_native(p)
    assert obs.shape == (ds.num_observations, 4)
    np.testing.assert_allclose(pts, ds.points, rtol=1e-12)
    np.testing.assert_allclose(obs[:, 2:], ds.observations, rtol=1e-9)
    d2 = load_bal(p)
    np.testing.assert_allclose(d2.focals, ds.focals, rtol=1e-12)


@needs_native
def test_native_malformed_bal(tmp_path):
    p = tmp_path / "bad.bal"
    p.write_text("3 5 10\n1.0 2.0\n")  # truncated
    with pytest.raises(ValueError, match="truncated|malformed"):
        load_bal(p)


@needs_native
def test_native_missing_file():
    with pytest.raises((ValueError, FileNotFoundError)):
        parse_g2o_native("/tmp/definitely_not_here_12345.g2o")
