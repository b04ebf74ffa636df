"""Pose-graph container shared by the G2O/TORO loaders.

Mirrors the reference apex-io Graph types (crates/apex-io/src/lib.rs:99-341):
vertices and edges for SE2/SE3 with measurement + information matrix. The
information matrix is carried for chi^2 reporting (the reference CLI's
metric, bin/pose_graph_g2o.rs:92-162) — the optimizer itself minimizes
unweighted between-factor residuals, matching the reference solver.

Storage conventions: SE2 ``[x, y, theta]``; SE3 ``[tx,ty,tz, qw,qx,qy,qz]``
(w-first — note g2o files are qx,qy,qz,qw and are converted on load).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional

import numpy as np


@dataclasses.dataclass
class Edge:
    frm: int
    to: int
    measurement: np.ndarray  # [3] SE2 or [7] SE3 storage
    information: np.ndarray  # [3,3] or [6,6]


@dataclasses.dataclass
class Graph:
    vertices_se2: Dict[int, np.ndarray] = dataclasses.field(default_factory=dict)
    vertices_se3: Dict[int, np.ndarray] = dataclasses.field(default_factory=dict)
    edges_se2: List[Edge] = dataclasses.field(default_factory=list)
    edges_se3: List[Edge] = dataclasses.field(default_factory=list)

    @property
    def is_se3(self) -> bool:
        return len(self.vertices_se3) > 0

    @property
    def num_vertices(self) -> int:
        return len(self.vertices_se2) + len(self.vertices_se3)

    @property
    def num_edges(self) -> int:
        return len(self.edges_se2) + len(self.edges_se3)

    def to_problem(self, loss=None, fix_first: bool = False, name_fmt: str = "x{}"):
        """Build an optimization Problem with one BetweenFactor per edge
        (mirrors bin/pose_graph_g2o.rs main flow)."""
        from ..core.problem import Problem
        from ..factors.between import BetweenFactor

        problem = Problem()
        manifold = "SE3" if self.is_se3 else "SE2"
        vertices = self.vertices_se3 if self.is_se3 else self.vertices_se2
        edges = self.edges_se3 if self.is_se3 else self.edges_se2
        for vid in sorted(vertices):
            problem.add_variable(name_fmt.format(vid), manifold, vertices[vid])
        for e in edges:
            problem.add_residual_block(
                [name_fmt.format(e.frm), name_fmt.format(e.to)],
                BetweenFactor(manifold, e.measurement),
                loss,
            )
        if fix_first and vertices:
            problem.fix_variable(name_fmt.format(sorted(vertices)[0]))
        return problem

    def chi2(self, values: Optional[Dict[str, np.ndarray]] = None,
             name_fmt: str = "x{}") -> float:
        """Information-weighted chi^2 = sum r^T Omega r, where
        r = Log(T_meas^{-1} (T_i^{-1} T_j)) — matches the reference CLI
        metric (bin/pose_graph_g2o.rs:92-162)."""
        import jax
        import jax.numpy as jnp

        from ..manifolds import get as get_manifold

        manifold = "SE3" if self.is_se3 else "SE2"
        G = get_manifold(manifold)
        vertices = self.vertices_se3 if self.is_se3 else self.vertices_se2
        edges = self.edges_se3 if self.is_se3 else self.edges_se2
        if not edges:
            return 0.0

        def val(vid):
            if values is not None:
                return values[name_fmt.format(vid)]
            return vertices[vid]

        # Host-side metric: keep it off the accelerator (tiny compute;
        # device dispatch latency dominates through remote TPU tunnels).
        with jax.default_device(jax.local_devices(backend="cpu")[0]):
            xi = jnp.asarray(np.stack([val(e.frm) for e in edges]))
            xj = jnp.asarray(np.stack([val(e.to) for e in edges]))
            meas = jnp.asarray(np.stack([e.measurement for e in edges]))
            infos = jnp.asarray(np.stack([e.information for e in edges]))
            rel = G.compose(G.inverse(xi), xj)
            r = G.log(G.compose(G.inverse(meas), rel))
            return float(jnp.einsum("ki,kij,kj->", r, infos, r))


def upper_tri_to_full(vals, n):
    """Row-major upper-triangular values -> symmetric full matrix."""
    M = np.zeros((n, n))
    k = 0
    for i in range(n):
        for j in range(i, n):
            M[i, j] = vals[k]
            M[j, i] = vals[k]
            k += 1
    return M


def full_to_upper_tri(M):
    n = M.shape[0]
    return [M[i, j] for i in range(n) for j in range(i, n)]
