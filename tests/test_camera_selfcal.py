"""Per-camera-model synthetic self-calibration integration tests.

Mirrors the reference's 7 camera_*_integration.rs files: generate a
deterministic scene, project through ground-truth intrinsics, perturb
poses/landmarks/intrinsics, optimize, assert recovery (SURVEY.md §4.2).
All cameras here use the +Z-forward convention.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import apex_tpu as apx
from apex_tpu import cameras
from apex_tpu.factors.projection import ProjectionFactor
from apex_tpu.manifolds import SE3, so3
from apex_tpu.manifolds.utils import mat_to_quat

MODELS = {
    "pinhole": np.array([450.0, 455.0, 320.0, 240.0]),
    "rad_tan": np.array([450.0, 455.0, 320.0, 240.0, -0.2, 0.05, 1e-4, -1e-4, 0.0]),
    "kannala_brandt": np.array([380.0, 379.0, 318.0, 242.0, 0.01, -0.002, 1e-3, -2e-4]),
    "fov": np.array([350.0, 350.0, 320.0, 240.0, 0.8]),
    "ucm": np.array([460.0, 460.0, 320.0, 240.0, 0.55]),
    "eucm": np.array([460.0, 460.0, 320.0, 240.0, 0.55, 1.05]),
    "double_sphere": np.array([350.0, 350.0, 320.0, 240.0, -0.15, 0.57]),
}


def make_scene(n_cams=6, n_pts=120, seed=0):
    """Wall of points at z in [3.5, 4.5] (world), cameras on an arc looking
    at it down +Z (reference camera_test_utils.rs wall-target pattern)."""
    rng = np.random.default_rng(seed)
    pts = np.stack(
        [rng.uniform(-2, 2, n_pts), rng.uniform(-1.5, 1.5, n_pts),
         rng.uniform(3.5, 4.5, n_pts)], axis=1
    )
    poses = []
    for i in range(n_cams):
        # small arc: camera centers near origin, looking down +Z
        c = np.array([0.6 * np.sin(i), 0.4 * np.cos(i), -0.3 + 0.1 * i])
        yaw = 0.08 * np.sin(2 * i)
        pitch = 0.05 * np.cos(i)
        Rcw = np.asarray(
            __import__("apex_tpu").manifolds.utils.quat_to_mat(
                so3.exp(jnp.asarray([pitch, yaw, 0.0]))
            )
        )
        t = -Rcw @ c
        q = np.asarray(mat_to_quat(jnp.asarray(Rcw)))
        poses.append(np.concatenate([t, q]))
    return np.stack(poses), pts


def build_problem(model_name, intr_true, optimize, seed=1, pixel_noise=0.3):
    cam = cameras.get(model_name)
    poses, pts = make_scene()
    rng = np.random.default_rng(seed)
    C, P = poses.shape[0], pts.shape[0]

    intr_all = np.tile(intr_true, (C, 1))
    # observations
    cam_idx, pt_idx, obs = [], [], []
    pw = jnp.asarray(pts)
    for i in range(C):
        p_cam = SE3.act(jnp.asarray(poses[i]), pw)
        uv, valid = cam.project(jnp.asarray(intr_all[i])[None], p_cam)
        uv = np.asarray(uv)
        valid = np.asarray(valid)
        for j in range(P):
            if valid[j] and abs(uv[j, 0] - intr_true[0 if model_name == "ftheta" else 2]) < 400:
                cam_idx.append(i)
                pt_idx.append(j)
                obs.append(uv[j] + rng.normal(0, pixel_noise, 2))
    cam_idx = np.asarray(cam_idx, dtype=np.int32)
    pt_idx = np.asarray(pt_idx, dtype=np.int32)
    obs = np.asarray(obs)
    assert len(obs) > 250, f"too few valid observations: {len(obs)}"

    # perturb initial values
    poses0 = np.asarray(
        SE3.plus(jnp.asarray(poses), jnp.asarray(rng.normal(0, 0.01, (C, 6))))
    )
    pts0 = pts + rng.normal(0, 0.02, pts.shape)
    intr0 = intr_all.copy()
    if "intrinsics" in optimize:
        intr0[:, :2] *= 1.0 + rng.normal(0, 0.02, (C, 2))  # focal off by ~2%

    problem = apx.Problem()
    K = cam.intrinsic_dim
    pose_names = [f"pose_{i:03d}" for i in range(C)]
    pt_names = [f"pt_{j:04d}" for j in range(P)]
    problem.add_variables_batch(pose_names, "SE3", poses0)
    problem.add_variables_batch(pt_names, "R3", pts0)
    data = {"obs": obs}
    slot_keys = []
    if "pose" in optimize:
        slot_keys.append([pose_names[i] for i in cam_idx])
    else:
        data["const_pose"] = poses0[cam_idx]
    slot_keys.append([pt_names[j] for j in pt_idx])
    if "intrinsics" in optimize:
        # One intrinsics variable shared by all views (a single moving
        # camera) — the well-posed self-calibration setup.
        problem.add_variables_batch(["intr_shared"], f"R{K}", intr0[:1])
        slot_keys.append(["intr_shared"] * len(cam_idx))
        if model_name == "double_sphere":
            # (f, xi, alpha) are mutually degenerate on narrow-FOV scenes;
            # calibrate focal/principal point with distortion fixed.
            problem.fix_variable("intr_shared", indices=[4, 5])
    else:
        data["const_intrinsics"] = intr_all[cam_idx]

    opt = tuple(s for s in ("pose", "landmark", "intrinsics") if s in optimize or s == "landmark")
    template = ProjectionFactor.template(cam, opt)
    problem.add_residual_block_batch(slot_keys, template, data, loss=apx.HuberLoss(2.0))
    problem.fix_variable(pose_names[0])
    # gauge: fix scale via second camera translation x
    problem.fix_variable(pose_names[1], indices=[0])
    return problem, len(obs), intr_true


@pytest.mark.parametrize("model", sorted(MODELS))
def test_selfcal_recovers(model):
    intr_true = MODELS[model]
    optimize = ("pose", "landmark", "intrinsics")
    problem, n_obs, intr_true = build_problem(model, intr_true, optimize)
    cfg = apx.LevenbergMarquardtConfig(
        linear_solver_type="schur_implicit", max_iterations=60,
        pcg_tolerance=1e-8, pcg_max_iterations=400,
    )
    res = apx.LevenbergMarquardt(cfg).optimize(problem)
    rmse = np.sqrt(res.final_cost / n_obs)
    assert rmse < 1.0, f"{model}: rmse {rmse}"
    assert res.final_cost < 0.5 * res.initial_cost
    # focal recovered within 1%
    intr_est = res.variables["intr_shared"]
    np.testing.assert_allclose(intr_est[0], intr_true[0], rtol=0.01)


def test_selfcal_dogleg_with_covariance():
    """BASELINE.md key config: joint pose+landmark+intrinsics BA with
    covariance estimation under Dog Leg."""
    from apex_tpu.optim.dogleg import DogLeg, DogLegConfig

    problem, n_obs, intr_true = build_problem(
        "pinhole", MODELS["pinhole"], ("pose", "landmark", "intrinsics"))
    cfg = DogLegConfig(max_iterations=40, compute_covariances=True)
    res = DogLeg(cfg).optimize(problem)
    assert res.final_cost < 0.5 * res.initial_cost
    assert res.covariances is not None
    cov = res.covariances["intr_shared"]
    d = cov.shape[0]
    assert cov.shape == (d, d)
    # a covariance: symmetric, positive diagonal
    np.testing.assert_allclose(cov, cov.T, atol=1e-8 * abs(cov).max())
    assert (np.diag(cov) > 0).all()
