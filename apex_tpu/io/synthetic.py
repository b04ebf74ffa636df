"""Synthetic dataset generators.

The reference downloads its benchmark datasets (sphere2500, intel, ... BAL
ladybug/venice) over the network; this environment has no egress, so these
generators produce *structurally equivalent* problems — same manifolds,
edge topology (odometry chain + loop closures), noise character, and BAL
camera convention — with known ground truth. The dataset registry
(datasets.py) still downloads the real files when a network is available.

All generators are deterministic given a seed and fully vectorized
(batched manifold ops + lax.scan for odometry integration).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .bal import BalDataset
from .graph import Edge, Graph


def _cpu():
    """Dataset generation is host-side data prep — always run it on the CPU
    backend even when the default device is a TPU (device dispatch and
    compile latency through the TPU tunnel dwarf the work)."""
    return jax.default_device(jax.local_devices(backend="cpu")[0])


def _integrate(G, start, steps):
    """Cumulative compose: start, start∘s0, start∘s0∘s1, ... -> [K+1, S]."""

    def body(carry, s):
        nxt = G.compose(carry, s)
        return nxt, nxt

    with _cpu():
        _, out = jax.lax.scan(body, jnp.asarray(start), jnp.asarray(steps))
        return np.asarray(jnp.concatenate([jnp.asarray(start)[None], out], axis=0))


def _synthetic_pose_graph_2d_impl(
    n_poses: int = 434,
    trajectory: str = "ring",
    odom_noise=(0.02, 0.02, 0.005),
    loop_noise=(0.02, 0.02, 0.005),
    loop_stride: int = 0,
    info_weight: float = 100.0,
    seed: int = 0,
) -> Graph:
    """SE2 pose graph: noisy odometry chain + loop closures, initialized by
    integrating the noisy odometry (classic drift). trajectory 'ring' mimics
    the ring dataset (closed circle); 'manhattan' mimics M3500-style grids."""
    from ..manifolds import SE2

    rng = np.random.default_rng(seed)

    if trajectory == "ring":
        step = np.array([2 * np.pi / n_poses * 5.0, 0.0, 2 * np.pi / n_poses])
        steps = np.tile(step, (n_poses - 1, 1))
    elif trajectory == "manhattan":
        turns = rng.choice([0.0, np.pi / 2, -np.pi / 2], size=n_poses - 1, p=[0.8, 0.1, 0.1])
        steps = np.stack([np.ones(n_poses - 1), np.zeros(n_poses - 1), turns], axis=1)
    else:
        raise ValueError(f"unknown trajectory {trajectory!r}")
    truth = _integrate(SE2, np.zeros(3), steps)

    # Edge index lists: odometry chain, ring closure, optional stride loops.
    src = list(range(n_poses - 1)) + [n_poses - 1]
    dst = list(range(1, n_poses)) + [0]
    if loop_stride > 0:
        for i in range(0, n_poses - loop_stride, loop_stride):
            src.append(i)
            dst.append(i + loop_stride)
    src = np.asarray(src)
    dst = np.asarray(dst)

    rels = np.asarray(SE2.between(jnp.asarray(truth[src]), jnp.asarray(truth[dst])))
    sig = np.asarray(odom_noise)
    noise = rng.normal(0, 1.0, rels.shape) * sig[None, :]
    meas = rels + noise

    info = np.diag([info_weight] * 3)
    g = Graph()
    g.edges_se2 = [Edge(int(src[k]), int(dst[k]), meas[k], info) for k in range(len(src))]

    # Initial guess: integrate the noisy odometry chain.
    est = _integrate(SE2, truth[0], meas[: n_poses - 1])
    g.vertices_se2 = {i: est[i] for i in range(n_poses)}
    return g


def _synthetic_pose_graph_3d_impl(
    n_poses: int = 2500,
    rings: int = 50,
    odom_noise_t: float = 0.05,
    odom_noise_r: float = 0.01,
    info_weight: float = 100.0,
    seed: int = 0,
    closure_strides: tuple = (1,),
) -> Graph:
    """SE3 pose graph shaped like the classic sphere2500: poses spiral over a
    sphere (``rings`` latitudes), odometry along the spiral plus loop-closure
    edges between vertically adjacent rings. Initialization integrates the
    noisy odometry.

    ``closure_strides``: ring offsets that receive loop-closure edges.
    The default (1,) is the sphere2500 density (~2 edges/vertex); (1, 2)
    approximates denser survey graphs like cubicle (~3 edges/vertex per
    the reference benches/README.md pose-graph dataset list) at the cost
    of doubling the band width."""
    from ..manifolds import SE3, so3

    rng = np.random.default_rng(seed)
    per_ring = n_poses // rings
    radius = 10.0

    k = np.arange(n_poses)
    ring = k // per_ring
    pos_in_ring = k % per_ring
    phi = np.pi * (ring + 1) / (rings + 1)
    theta = 2 * np.pi * pos_in_ring / per_ring
    p = radius * np.stack(
        [np.sin(phi) * np.cos(theta), np.sin(phi) * np.sin(theta), np.cos(phi)], axis=1
    )
    yaw = theta + np.pi / 2
    q = np.asarray(
        so3.exp(jnp.stack([jnp.zeros(n_poses), jnp.zeros(n_poses), jnp.asarray(yaw)], axis=1))
    )
    truth = np.concatenate([p, q], axis=1)

    src = list(range(n_poses - 1))
    dst = list(range(1, n_poses))
    n_odom = len(src)
    for stride in closure_strides:
        span = stride * per_ring
        src += list(range(n_poses - span))
        dst += list(range(span, n_poses))
    src = np.asarray(src)
    dst = np.asarray(dst)

    rels = np.asarray(SE3.between(jnp.asarray(truth[src]), jnp.asarray(truth[dst])))
    tau = np.concatenate(
        [
            rng.normal(0, odom_noise_t, (len(src), 3)),
            rng.normal(0, odom_noise_r, (len(src), 3)),
        ],
        axis=1,
    )
    meas = np.asarray(SE3.plus(jnp.asarray(rels), jnp.asarray(tau)))

    info = np.diag([info_weight] * 6)
    g = Graph()
    g.edges_se3 = [Edge(int(src[i]), int(dst[i]), meas[i], info) for i in range(len(src))]

    est = _integrate(SE3, truth[0], meas[:n_odom])
    g.vertices_se3 = {i: est[i] for i in range(n_poses)}
    return g


def _synthetic_pose_graph_grid3d_impl(
    nx: int = 10,
    ny: int = 10,
    nz: int = 10,
    spacing: float = 1.0,
    noise_t: float = 0.05,
    noise_r: float = 0.01,
    info_weight: float = 100.0,
    seed: int = 0,
) -> Graph:
    """SE3 pose graph on a 3D lattice — the shape of the reference
    registry's grid3D dataset (crates/apex-io/src/utils.rs:45-300): one
    vertex per lattice point, relative-pose edges to the +x/+y/+z
    neighbors. This is the HIGH-TREEWIDTH topology class: no 1-D ordering
    makes it banded (RCM bandwidth ~ nx*ny blocks), so it exercises the
    general-sparsity direct tier (linalg/sparse_general.py).
    Initialization perturbs ground truth (there is no single odometry
    chain to integrate)."""
    from ..manifolds import SE3, so3

    rng = np.random.default_rng(seed)
    ii, jj, kk = np.meshgrid(np.arange(nx), np.arange(ny), np.arange(nz),
                             indexing="ij")
    p = spacing * np.stack([ii, jj, kk], axis=-1).reshape(-1, 3).astype(float)
    n = p.shape[0]
    yaw = rng.uniform(-0.3, 0.3, n)
    q = np.asarray(so3.exp(jnp.stack(
        [jnp.zeros(n), jnp.zeros(n), jnp.asarray(yaw)], axis=1)))
    truth = np.concatenate([p, q], axis=1)

    def vid(a, b, c):
        return (a * ny + b) * nz + c

    src, dst = [], []
    for a in range(nx):
        for b in range(ny):
            for c in range(nz):
                v = vid(a, b, c)
                if a + 1 < nx:
                    src.append(v); dst.append(vid(a + 1, b, c))
                if b + 1 < ny:
                    src.append(v); dst.append(vid(a, b + 1, c))
                if c + 1 < nz:
                    src.append(v); dst.append(vid(a, b, c + 1))
    src = np.asarray(src)
    dst = np.asarray(dst)
    rels = np.asarray(SE3.between(jnp.asarray(truth[src]), jnp.asarray(truth[dst])))
    tau = np.concatenate(
        [rng.normal(0, noise_t, (len(src), 3)),
         rng.normal(0, noise_r, (len(src), 3))], axis=1)
    meas = np.asarray(SE3.plus(jnp.asarray(rels), jnp.asarray(tau)))

    info = np.diag([info_weight] * 6)
    g = Graph()
    g.edges_se3 = [Edge(int(src[i]), int(dst[i]), meas[i], info)
                   for i in range(len(src))]
    pert = np.concatenate(
        [rng.normal(0, 0.1, (n, 3)), rng.normal(0, 0.02, (n, 3))], axis=1)
    est = np.array(SE3.plus(jnp.asarray(truth), jnp.asarray(pert)))
    est[0] = truth[0]
    g.vertices_se3 = {i: est[i] for i in range(n)}
    return g


def _synthetic_ba_impl(
    n_cameras: int = 49,
    n_points: int = 1000,
    image_size: float = 800.0,
    focal: float = 800.0,
    pixel_noise: float = 1.0,
    point_init_noise: float = 0.05,
    pose_init_noise: float = 0.02,
    seed: int = 0,
) -> BalDataset:
    """Synthetic BAL problem in Snavely convention: cameras on a ring of
    radius 5 looking at a point cloud at the origin (cameras look down -Z in
    camera frame). Ground truth perturbed for initialization; observations
    carry pixel noise."""
    from ..manifolds import so3
    from ..manifolds.utils import mat_to_quat, quat_to_mat

    rng = np.random.default_rng(seed)
    pts_true = rng.uniform(-1.5, 1.5, (n_points, 3))

    ang = 2 * np.pi * np.arange(n_cameras) / n_cameras
    centers = 5.0 * np.stack([np.cos(ang), np.sin(ang), 0.3 * np.sin(2 * ang)], axis=1)
    fwd = -centers / np.linalg.norm(centers, axis=1, keepdims=True)
    up = np.tile(np.array([0.0, 0.0, 1.0]), (n_cameras, 1))
    right = np.cross(fwd, up)
    right /= np.linalg.norm(right, axis=1, keepdims=True)
    up2 = np.cross(right, fwd)
    # world <- cam axes: x=right, y=-up2, z=-fwd  (Snavely -Z forward)
    Rwc = np.stack([right, -up2, -fwd], axis=2)
    Rcw = np.transpose(Rwc, (0, 2, 1))
    trans = -np.einsum("cij,cj->ci", Rcw, centers)
    qs = np.asarray(mat_to_quat(jnp.asarray(Rcw)))
    rots = np.asarray(so3.log(jnp.asarray(qs)))

    # Project all points into all cameras (batched), keep valid ones.
    R = np.asarray(quat_to_mat(jnp.asarray(qs)))  # [C,3,3]
    pc = np.einsum("cij,pj->cpi", R, pts_true) + trans[:, None, :]
    z = pc[..., 2]
    in_front = z < -0.5
    with np.errstate(divide="ignore", invalid="ignore"):
        xn = -pc[..., 0] / z
        yn = -pc[..., 1] / z
    u = focal * xn
    v = focal * yn
    ok = in_front & (np.abs(u) < image_size / 2) & (np.abs(v) < image_size / 2)
    cam_idx, pt_idx = np.nonzero(ok)
    obs = np.stack([u[ok], v[ok]], axis=1) + rng.normal(0, pixel_noise, (ok.sum(), 2))

    pts0 = pts_true + rng.normal(0, point_init_noise, pts_true.shape)
    rots0 = rots + rng.normal(0, pose_init_noise, rots.shape)
    trans0 = trans + rng.normal(0, pose_init_noise, trans.shape)

    return BalDataset(
        rotations=rots0,
        translations=trans0,
        focals=np.full(n_cameras, focal),
        k1=np.zeros(n_cameras),
        k2=np.zeros(n_cameras),
        points=pts0,
        cam_indices=cam_idx.astype(np.int32),
        point_indices=pt_idx.astype(np.int32),
        observations=obs,
    )


def _synthetic_ba_large_impl(
    n_cameras: int = 1778,
    n_points: int = 993_923,
    obs_per_camera: int = 2800,
    focal: float = 800.0,
    pixel_noise: float = 1.0,
    point_init_noise: float = 0.05,
    pose_init_noise: float = 0.01,
    seed: int = 0,
) -> BalDataset:
    """Venice/ladybug-scale synthetic BA without the O(C*P) visibility test:
    each camera observes a deterministic pseudo-random subset of points in
    its frustum-ish region, built by index arithmetic. Observation count is
    ~n_cameras * obs_per_camera (venice: 1778 * 2813 ~ 5.0M)."""
    from ..manifolds import so3
    from ..manifolds.utils import mat_to_quat, quat_to_mat

    rng = np.random.default_rng(seed)
    pts_true = rng.uniform(-2.0, 2.0, (n_points, 3)).astype(np.float64)

    ang = 2 * np.pi * np.arange(n_cameras) / n_cameras
    centers = 6.0 * np.stack([np.cos(ang), np.sin(ang), 0.25 * np.sin(3 * ang)], axis=1)
    fwd = -centers / np.linalg.norm(centers, axis=1, keepdims=True)
    up = np.tile(np.array([0.0, 0.0, 1.0]), (n_cameras, 1))
    right = np.cross(fwd, up)
    right /= np.linalg.norm(right, axis=1, keepdims=True)
    up2 = np.cross(right, fwd)
    Rwc = np.stack([right, -up2, -fwd], axis=2)
    Rcw = np.transpose(Rwc, (0, 2, 1))
    trans = -np.einsum("cij,cj->ci", Rcw, centers)
    qs = np.asarray(mat_to_quat(jnp.asarray(Rcw)))
    rots = np.asarray(so3.log(jnp.asarray(qs)))
    R = np.asarray(quat_to_mat(jnp.asarray(qs)))

    # Each camera samples obs_per_camera candidate points (deterministic
    # stride + jitter); keep the in-front ones.
    cam_idx_list, pt_idx_list, obs_list = [], [], []
    for i in range(n_cameras):
        crng = np.random.default_rng(seed * 1_000_003 + i)
        cand = crng.integers(0, n_points, size=int(obs_per_camera * 1.3))
        pc = pts_true[cand] @ R[i].T + trans[i]
        z = pc[:, 2]
        ok = z < -0.5
        cand, pc, z = cand[ok], pc[ok], z[ok]
        u = focal * (-pc[:, 0] / z)
        v = focal * (-pc[:, 1] / z)
        keep = (np.abs(u) < 500) & (np.abs(v) < 500)
        take = min(obs_per_camera, int(keep.sum()))
        sel = np.nonzero(keep)[0][:take]
        cam_idx_list.append(np.full(take, i, dtype=np.int32))
        pt_idx_list.append(cand[sel].astype(np.int32))
        obs_list.append(
            np.stack([u[sel], v[sel]], axis=1)
            + crng.normal(0, pixel_noise, (take, 2))
        )
    cam_idx = np.concatenate(cam_idx_list)
    pt_idx = np.concatenate(pt_idx_list)
    obs = np.concatenate(obs_list)

    pts0 = pts_true + rng.normal(0, point_init_noise, pts_true.shape)
    rots0 = rots + rng.normal(0, pose_init_noise, rots.shape)
    trans0 = trans + rng.normal(0, pose_init_noise, trans.shape)
    return BalDataset(
        rotations=rots0,
        translations=trans0,
        focals=np.full(n_cameras, focal),
        k1=np.zeros(n_cameras),
        k2=np.zeros(n_cameras),
        points=pts0,
        cam_indices=cam_idx,
        point_indices=pt_idx,
        observations=obs,
    )


def synthetic_pose_graph_2d(*args, **kw):
    with _cpu():
        return _synthetic_pose_graph_2d_impl(*args, **kw)


def synthetic_pose_graph_3d(*args, **kw):
    with _cpu():
        return _synthetic_pose_graph_3d_impl(*args, **kw)


def synthetic_pose_graph_grid3d(*args, **kw):
    with _cpu():
        return _synthetic_pose_graph_grid3d_impl(*args, **kw)


def synthetic_ba(*args, **kw):
    with _cpu():
        return _synthetic_ba_impl(*args, **kw)


def synthetic_ba_large(*args, **kw):
    with _cpu():
        return _synthetic_ba_large_impl(*args, **kw)


synthetic_pose_graph_2d.__doc__ = _synthetic_pose_graph_2d_impl.__doc__
synthetic_pose_graph_3d.__doc__ = _synthetic_pose_graph_3d_impl.__doc__
synthetic_pose_graph_grid3d.__doc__ = _synthetic_pose_graph_grid3d_impl.__doc__
synthetic_ba.__doc__ = _synthetic_ba_impl.__doc__
