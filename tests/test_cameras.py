"""Camera model tests: project/unproject round-trips, analytic-vs-numeric
Jacobians (reference pattern: apex-camera-models with
NUMERICAL_DERIVATIVE_EPS / JACOBIAN_TEST_TOLERANCE), validity masks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from apex_tpu import cameras

EPS = 1e-7

CASES = [
    ("bal_pinhole", jnp.asarray([800.0, -0.05, 0.01]), -1),
    ("pinhole", jnp.asarray([500.0, 510.0, 320.0, 240.0]), +1),
    ("rad_tan", jnp.asarray([460.0, 455.0, 320.0, 240.0, -0.28, 0.07, 1e-4, -2e-4, 0.0]), +1),
    ("kannala_brandt", jnp.asarray([380.0, 379.0, 318.0, 242.0, 0.01, -0.002, 0.001, -2e-4]), +1),
    ("fov", jnp.asarray([300.0, 300.0, 320.0, 240.0, 0.9]), +1),
    ("ucm", jnp.asarray([460.0, 460.0, 320.0, 240.0, 0.6]), +1),
    ("eucm", jnp.asarray([460.0, 460.0, 320.0, 240.0, 0.6, 1.1]), +1),
    ("double_sphere", jnp.asarray([350.0, 350.0, 320.0, 240.0, -0.2, 0.59]), +1),
    ("ftheta", jnp.asarray([320.0, 240.0, 300.0, 5.0, -2.0, 0.3]), +1),
]


def sample_points(sign, n=20, seed=0):
    rng = np.random.default_rng(seed)
    p = rng.uniform(-1, 1, (n, 3))
    p[:, 2] = sign * rng.uniform(1.0, 5.0, n)
    return jnp.asarray(p)


@pytest.mark.parametrize("name,intr,sign", CASES, ids=[c[0] for c in CASES])
def test_jacobians_match_numeric(name, intr, sign):
    cam = cameras.get(name)
    pts = sample_points(sign)
    intr_b = jnp.broadcast_to(intr, (pts.shape[0], intr.shape[0]))
    Jp, Ji = cam.jacobians(intr_b, pts)

    uv0, valid = cam.project(intr_b, pts)
    assert bool(jnp.all(valid))
    for k in range(3):
        e = jnp.zeros(3).at[k].set(EPS)
        up, _ = cam.project(intr_b, pts + e)
        um, _ = cam.project(intr_b, pts - e)
        num = (up - um) / (2 * EPS)
        np.testing.assert_allclose(np.asarray(Jp[..., k]), np.asarray(num), atol=1e-5, rtol=1e-5)
    for k in range(cam.intrinsic_dim):
        e = jnp.zeros(cam.intrinsic_dim).at[k].set(EPS)
        up, _ = cam.project(intr_b + e, pts)
        um, _ = cam.project(intr_b - e, pts)
        num = (up - um) / (2 * EPS)
        np.testing.assert_allclose(np.asarray(Ji[..., k]), np.asarray(num), atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("name,intr,sign", CASES, ids=[c[0] for c in CASES])
def test_project_unproject_roundtrip(name, intr, sign):
    cam = cameras.get(name)
    pts = sample_points(sign, seed=3)
    intr_b = jnp.broadcast_to(intr, (pts.shape[0], intr.shape[0]))
    uv, valid = cam.project(intr_b, pts)
    rays = cam.unproject(intr_b, uv)
    # unprojected ray must be parallel to the original point
    pn = pts / jnp.linalg.norm(pts, axis=-1, keepdims=True)
    dots = jnp.abs(jnp.sum(pn * rays, axis=-1))
    np.testing.assert_allclose(np.asarray(dots), 1.0, atol=1e-8)


@pytest.mark.parametrize("name,intr,sign", CASES, ids=[c[0] for c in CASES])
def test_validity_mask_behind_camera(name, intr, sign):
    cam = cameras.get(name)
    behind = jnp.asarray([[0.1, 0.2, -sign * 2.0]])
    intr_b = intr[None]
    uv, valid = cam.project(intr_b, behind)
    assert not bool(valid[0])
    assert bool(jnp.all(jnp.isfinite(uv)))  # safe-z keeps it NaN-free
    pb = cam.project_batch(intr_b, behind)
    np.testing.assert_allclose(np.asarray(pb[0]), [1e6, 1e6])


def test_bal_pinhole_matches_snavely_formula():
    cam = cameras.get("bal_pinhole")
    intr = jnp.asarray([[1000.0, -0.1, 0.02]])
    p = jnp.asarray([[0.3, -0.2, -2.0]])
    uv, valid = cam.project(intr, p)
    xn, yn = 0.3 / 2.0, -0.2 / 2.0
    r2 = xn * xn + yn * yn
    d = 1 + -0.1 * r2 + 0.02 * r2 * r2
    np.testing.assert_allclose(np.asarray(uv[0]), [1000 * d * xn, 1000 * d * yn], rtol=1e-12)
    assert bool(valid[0])


def test_validate_params():
    with pytest.raises(ValueError):
        cameras.get("bal_pinhole").validate_params(np.array([-5.0, 0.0, 0.0]))
    with pytest.raises(ValueError):
        cameras.get("pinhole").validate_params(np.array([0.0, 1.0, 0.0, 0.0]))
    with pytest.raises(KeyError):
        cameras.get("not_a_camera")
