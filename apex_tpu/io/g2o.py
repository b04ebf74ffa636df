"""G2O file loader/writer.

Format support mirrors the reference (crates/apex-io/src/g2o.rs:156-550):
- VERTEX_SE2 id x y theta
- VERTEX_SE3:QUAT id x y z qx qy qz qw      (converted to w-first storage)
- EDGE_SE2 i j dx dy dtheta + 6 upper-triangular info values (row-major)
- EDGE_SE3:QUAT i j tx ty tz qx qy qz qw + 21 upper-triangular info values

Unknown tags are skipped. Quaternions are normalized on load (the reference
rejects |norm-1| > 0.01; we normalize and only reject wildly invalid ones).
"""

from __future__ import annotations

import numpy as np

from .graph import Edge, Graph, full_to_upper_tri, upper_tri_to_full


def _norm_quat_wfirst(qx, qy, qz, qw, where=""):
    q = np.array([qw, qx, qy, qz])
    n = np.linalg.norm(q)
    if not np.isfinite(n) or n < 1e-3:
        raise ValueError(f"invalid quaternion norm {n} {where}")
    return q / n


def load_g2o(path) -> Graph:
    # Native C++ mmap parser when available; falls back to pure Python.
    from ..native import parse_g2o_native

    try:
        native = parse_g2o_native(path)
    except ValueError:
        raise
    except Exception:
        native = None
    if native is not None:
        return _graph_from_native(*native)
    return _load_g2o_python(path)


def _graph_from_native(v2, v3, e2, e3) -> Graph:
    import numpy as _np

    g = Graph()
    for row in v2:
        g.vertices_se2[int(row[0])] = row[1:4].copy()
    for row in v3:
        q = _norm_quat_wfirst(row[4], row[5], row[6], row[7])
        g.vertices_se3[int(row[0])] = _np.concatenate([row[1:4], q])
    for row in e2:
        info = upper_tri_to_full(row[5:11], 3)
        g.edges_se2.append(Edge(int(row[0]), int(row[1]), row[2:5].copy(), info))
    for row in e3:
        q = _norm_quat_wfirst(row[5], row[6], row[7], row[8])
        meas = _np.concatenate([row[2:5], q])
        info = upper_tri_to_full(row[9:30], 6)
        g.edges_se3.append(Edge(int(row[0]), int(row[1]), meas, info))
    return g


def _load_g2o_python(path) -> Graph:
    g = Graph()
    with open(path, "r") as f:
        for lineno, line in enumerate(f, 1):
            parts = line.split()
            if not parts or parts[0].startswith("#"):
                continue
            tag = parts[0]
            try:
                if tag == "VERTEX_SE2":
                    vid = int(parts[1])
                    g.vertices_se2[vid] = np.array(
                        [float(parts[2]), float(parts[3]), float(parts[4])]
                    )
                elif tag == "VERTEX_SE3:QUAT":
                    vid = int(parts[1])
                    t = [float(parts[2]), float(parts[3]), float(parts[4])]
                    q = _norm_quat_wfirst(
                        float(parts[5]), float(parts[6]), float(parts[7]),
                        float(parts[8]), where=f"line {lineno}",
                    )
                    g.vertices_se3[vid] = np.array(t + list(q))
                elif tag == "EDGE_SE2":
                    frm, to = int(parts[1]), int(parts[2])
                    meas = np.array([float(parts[3]), float(parts[4]), float(parts[5])])
                    info = upper_tri_to_full([float(x) for x in parts[6:12]], 3)
                    g.edges_se2.append(Edge(frm, to, meas, info))
                elif tag == "EDGE_SE3:QUAT":
                    frm, to = int(parts[1]), int(parts[2])
                    t = [float(parts[3]), float(parts[4]), float(parts[5])]
                    q = _norm_quat_wfirst(
                        float(parts[6]), float(parts[7]), float(parts[8]),
                        float(parts[9]), where=f"line {lineno}",
                    )
                    meas = np.array(t + list(q))
                    info = upper_tri_to_full([float(x) for x in parts[10:31]], 6)
                    g.edges_se3.append(Edge(frm, to, meas, info))
            except (IndexError, ValueError) as e:
                raise ValueError(f"{path}:{lineno}: malformed {tag} line: {e}") from e
    return g


def save_g2o(path, graph: Graph):
    with open(path, "w") as f:
        for vid in sorted(graph.vertices_se2):
            x, y, th = graph.vertices_se2[vid]
            f.write(f"VERTEX_SE2 {vid} {x:.17e} {y:.17e} {th:.17e}\n")
        for vid in sorted(graph.vertices_se3):
            v = graph.vertices_se3[vid]
            # storage [t, qw,qx,qy,qz] -> file x y z qx qy qz qw
            f.write(
                f"VERTEX_SE3:QUAT {vid} {v[0]:.17e} {v[1]:.17e} {v[2]:.17e} "
                f"{v[4]:.17e} {v[5]:.17e} {v[6]:.17e} {v[3]:.17e}\n"
            )
        for e in graph.edges_se2:
            vals = " ".join(f"{x:.17e}" for x in full_to_upper_tri(e.information))
            m = e.measurement
            f.write(f"EDGE_SE2 {e.frm} {e.to} {m[0]:.17e} {m[1]:.17e} {m[2]:.17e} {vals}\n")
        for e in graph.edges_se3:
            vals = " ".join(f"{x:.17e}" for x in full_to_upper_tri(e.information))
            m = e.measurement
            f.write(
                f"EDGE_SE3:QUAT {e.frm} {e.to} {m[0]:.17e} {m[1]:.17e} {m[2]:.17e} "
                f"{m[4]:.17e} {m[5]:.17e} {m[6]:.17e} {m[3]:.17e} {vals}\n"
            )
